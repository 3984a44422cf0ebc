"""Compact script folding for name comparison (C1 per-script analysis).

The reference's name analysis compares names across scripts via rigour's
transliteration layer (``nomenklatura/matching/logic_v2/names/analysis.py:34-106``
prunes the name product on shared scripts and relies on latinised
``comparable`` forms).  This module re-expresses that with deterministic,
table-driven romanisation for the scripts that appear in sanctions data:
Cyrillic, Greek, Hebrew, Arabic (+Persian), Georgian, Armenian and Hangul
(algorithmic jamo decomposition).  CJK and Indic scripts pass through
unchanged — same-script comparison still works on the raw codepoints.

Folding is applied identically to both sides of every comparison, so
same-script pairs are unaffected beyond diacritic removal, while
cross-script pairs (e.g. "Ротенберг" vs "Rotenberg") land in one space.
All tables are standard public romanisation conventions (BGN/PCGN-ish),
chosen for stability over linguistic fidelity.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

# Latin characters NFKD does not decompose.
_LATIN_EXTRA = {
    "ß": "ss", "æ": "ae", "œ": "oe", "ø": "o", "đ": "d", "ð": "d",
    "þ": "th", "ł": "l", "ħ": "h", "ŋ": "ng", "ı": "i", "ĸ": "k",
}

_CYRILLIC = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "е": "e", "ё": "e",
    "ж": "zh", "з": "z", "и": "i", "й": "i", "к": "k", "л": "l", "м": "m",
    "н": "n", "о": "o", "п": "p", "р": "r", "с": "s", "т": "t", "у": "u",
    "ф": "f", "х": "kh", "ц": "ts", "ч": "ch", "ш": "sh", "щ": "shch",
    "ъ": "", "ы": "y", "ь": "", "э": "e", "ю": "yu", "я": "ya",
    # Ukrainian / Belarusian / Serbian / Macedonian extensions
    "і": "i", "ї": "yi", "є": "ye", "ґ": "g", "ў": "u", "ђ": "dj",
    "љ": "lj", "њ": "nj", "ћ": "c", "џ": "dz", "ј": "j", "ѓ": "g",
    "ќ": "k", "ѕ": "dz", "ә": "a", "ғ": "g", "қ": "k", "ң": "n",
    "ө": "o", "ұ": "u", "ү": "u", "һ": "h",
}

_GREEK = {
    "α": "a", "β": "v", "γ": "g", "δ": "d", "ε": "e", "ζ": "z", "η": "i",
    "θ": "th", "ι": "i", "κ": "k", "λ": "l", "μ": "m", "ν": "n", "ξ": "x",
    "ο": "o", "π": "p", "ρ": "r", "σ": "s", "ς": "s", "τ": "t", "υ": "y",
    "φ": "f", "χ": "ch", "ψ": "ps", "ω": "o",
}

_HEBREW = {
    "א": "a", "ב": "b", "ג": "g", "ד": "d", "ה": "h", "ו": "v", "ז": "z",
    "ח": "ch", "ט": "t", "י": "y", "כ": "k", "ך": "k", "ל": "l", "מ": "m",
    "ם": "m", "נ": "n", "ן": "n", "ס": "s", "ע": "a", "פ": "p", "ף": "p",
    "צ": "ts", "ץ": "ts", "ק": "k", "ר": "r", "ש": "sh", "ת": "t",
}

_ARABIC = {
    "ا": "a", "ب": "b", "ت": "t", "ث": "th", "ج": "j", "ح": "h", "خ": "kh",
    "د": "d", "ذ": "dh", "ر": "r", "ز": "z", "س": "s", "ش": "sh", "ص": "s",
    "ض": "d", "ط": "t", "ظ": "z", "ع": "a", "غ": "gh", "ف": "f", "ق": "q",
    "ك": "k", "ل": "l", "م": "m", "ن": "n", "ه": "h", "و": "w", "ي": "y",
    "ى": "a", "ء": "", "آ": "a", "أ": "a", "إ": "i", "ؤ": "w", "ئ": "y",
    "ة": "h",
    # Persian / Urdu extensions
    "پ": "p", "چ": "ch", "ژ": "zh", "گ": "g", "ک": "k", "ی": "y",
}

_GEORGIAN = {
    "ა": "a", "ბ": "b", "გ": "g", "დ": "d", "ე": "e", "ვ": "v", "ზ": "z",
    "თ": "t", "ი": "i", "კ": "k", "ლ": "l", "მ": "m", "ნ": "n", "ო": "o",
    "პ": "p", "ჟ": "zh", "რ": "r", "ს": "s", "ტ": "t", "უ": "u", "ფ": "p",
    "ქ": "k", "ღ": "gh", "ყ": "q", "შ": "sh", "ჩ": "ch", "ც": "ts",
    "ძ": "dz", "წ": "ts", "ჭ": "ch", "ხ": "kh", "ჯ": "j", "ჰ": "h",
}

_ARMENIAN = {
    "ա": "a", "բ": "b", "գ": "g", "դ": "d", "ե": "e", "զ": "z", "է": "e",
    "ը": "e", "թ": "t", "ժ": "zh", "ի": "i", "լ": "l", "խ": "kh", "ծ": "ts",
    "կ": "k", "հ": "h", "ձ": "dz", "ղ": "gh", "ճ": "ch", "մ": "m",
    "յ": "y", "ն": "n", "շ": "sh", "ո": "o", "չ": "ch", "պ": "p", "ջ": "j",
    "ռ": "r", "ս": "s", "վ": "v", "տ": "t", "ր": "r", "ց": "ts", "ւ": "v",
    "փ": "p", "ք": "k", "օ": "o", "ֆ": "f", "և": "ev",
}

_TABLE: dict[str, str] = {}
for _t in (_LATIN_EXTRA, _CYRILLIC, _GREEK, _HEBREW, _ARABIC, _GEORGIAN, _ARMENIAN):
    _TABLE.update(_t)

# Hangul syllable decomposition (U+AC00..U+D7A3) — standard jamo romanisation.
_HANGUL_LEAD = (
    "g", "kk", "n", "d", "tt", "r", "m", "b", "pp", "s", "ss", "",
    "j", "jj", "ch", "k", "t", "p", "h",
)
_HANGUL_VOWEL = (
    "a", "ae", "ya", "yae", "eo", "e", "yeo", "ye", "o", "wa", "wae",
    "oe", "yo", "u", "wo", "we", "wi", "yu", "eu", "ui", "i",
)
_HANGUL_TAIL = (
    "", "g", "kk", "gs", "n", "nj", "nh", "d", "l", "lg", "lm", "lb",
    "ls", "lt", "lp", "lh", "m", "b", "bs", "s", "ss", "ng", "j", "ch",
    "k", "t", "p", "h",
)


def _hangul(ch: str) -> str | None:
    cp = ord(ch)
    if 0xAC00 <= cp <= 0xD7A3:
        idx = cp - 0xAC00
        return (
            _HANGUL_LEAD[idx // 588]
            + _HANGUL_VOWEL[(idx % 588) // 28]
            + _HANGUL_TAIL[idx % 28]
        )
    return None


@lru_cache(maxsize=200_000)
def fold_text(text: str) -> str:
    """Lowercase, strip diacritics, romanise known scripts.

    Unknown codepoints (CJK, Thai, ...) pass through so same-script
    comparison still works.
    """
    out: list[str] = []
    # NFKD before lowercasing: compatibility forms (math alphabets,
    # fullwidth letters) decompose to cased base letters first, so one
    # fold pass reaches the fixpoint
    for ch in unicodedata.normalize("NFKD", text).lower():
        if unicodedata.combining(ch):
            continue
        mapped = _TABLE.get(ch)
        if mapped is not None:
            out.append(mapped)
            continue
        h = _hangul(ch)
        if h is not None:
            out.append(h)
            continue
        out.append(ch)
    return "".join(out)
