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


# Kana romanisation (Hepburn-ish).  Keyed on NFC codepoints so voiced
# forms (バ = ハ+゛ under NFKD) are resolved before any decomposition.
_KANA_BASE = {
    "あ": "a", "い": "i", "う": "u", "え": "e", "お": "o",
    "か": "ka", "き": "ki", "く": "ku", "け": "ke", "こ": "ko",
    "が": "ga", "ぎ": "gi", "ぐ": "gu", "げ": "ge", "ご": "go",
    "さ": "sa", "し": "shi", "す": "su", "せ": "se", "そ": "so",
    "ざ": "za", "じ": "ji", "ず": "zu", "ぜ": "ze", "ぞ": "zo",
    "た": "ta", "ち": "chi", "つ": "tsu", "て": "te", "と": "to",
    "だ": "da", "ぢ": "ji", "づ": "zu", "で": "de", "ど": "do",
    "な": "na", "に": "ni", "ぬ": "nu", "ね": "ne", "の": "no",
    "は": "ha", "ひ": "hi", "ふ": "fu", "へ": "he", "ほ": "ho",
    "ば": "ba", "び": "bi", "ぶ": "bu", "べ": "be", "ぼ": "bo",
    "ぱ": "pa", "ぴ": "pi", "ぷ": "pu", "ぺ": "pe", "ぽ": "po",
    "ま": "ma", "み": "mi", "む": "mu", "め": "me", "も": "mo",
    "や": "ya", "ゆ": "yu", "よ": "yo",
    "ら": "ra", "り": "ri", "る": "ru", "れ": "re", "ろ": "ro",
    "わ": "wa", "ゐ": "wi", "ゑ": "we", "を": "o", "ん": "n",
    "ゔ": "vu",
    # small vowels (combination second elements: ヴィ, ウェ, ...)
    "ぁ": "a", "ぃ": "i", "ぅ": "u", "ぇ": "e", "ぉ": "o",
}
_KANA: dict[str, str] = dict(_KANA_BASE)
for _h, _r in _KANA_BASE.items():
    _cp = ord(_h)
    if 0x3041 <= _cp <= 0x3096:  # hiragana -> katakana offset
        _KANA[chr(_cp + 0x60)] = _r
_KANA_SMALL_Y = {"ゃ": "ya", "ゅ": "yu", "ょ": "yo",
                 "ャ": "ya", "ュ": "yu", "ョ": "yo"}
_KANA_SOKUON = {"っ", "ッ"}
_KANA_SKIP = {"ー", "・", "゛", "゜"}

# Khmer (UNGEGN-ish, compact).  Dependent vowel signs are Mn codepoints
# that the tokenizer would otherwise discard as non-word characters,
# collapsing distinct names ("ម៉ាណាត" Manat / "ម៉ាណែត" Manet) into one
# consonant skeleton — so they must romanise here, before tokenization.
_KHMER_CONS = {
    "ក": "k", "ខ": "kh", "គ": "k", "ឃ": "kh", "ង": "ng",
    "ច": "ch", "ឆ": "ch", "ជ": "ch", "ឈ": "ch", "ញ": "nh",
    "ដ": "d", "ឋ": "th", "ឌ": "d", "ឍ": "th", "ណ": "n",
    "ត": "t", "ថ": "th", "ទ": "t", "ធ": "th", "ន": "n",
    "ប": "b", "ផ": "ph", "ព": "p", "ភ": "ph", "ម": "m",
    "យ": "y", "រ": "r", "ល": "l", "វ": "v", "ស": "s",
    "ហ": "h", "ឡ": "l", "អ": "a",
    # independent vowels
    "ឥ": "i", "ឦ": "i", "ឧ": "u", "ឩ": "u", "ឪ": "u",
    "ឯ": "e", "ឰ": "ai", "ឱ": "o", "ឲ": "o", "ឳ": "au",
}
_KHMER_VOWEL = {
    "ា": "a", "ិ": "i", "ី": "i", "ឹ": "e", "ឺ": "eu",
    "ុ": "u", "ូ": "u", "ួ": "uo", "ើ": "ae", "ឿ": "oe",
    "ៀ": "ie", "េ": "e", "ែ": "e", "ៃ": "ai", "ោ": "o",
    "ៅ": "au", "ំ": "m", "ះ": "h",
}
# musikatoan/trisap shift the consonant series: ប៉ = p, otherwise dropped
_KHMER_SHIFT = {"៉", "៊"}
_KHMER_DROP = {"់", "៌", "៍", "៎", "៏", "័", "៝", "ៈ", "្"}

# Indic abugidas (Devanagari, Bengali, Kannada) + Burmese, same
# principle as Khmer: consonants romanise bare, dependent vowel signs
# (Mn codepoints the tokenizer would discard) romanise to vowels, virama
# drops.  Inherent vowels are not reconstructed — adequate for the name
# comparison this feeds ("पुतिन" -> "putin", "व्लादिमीर" -> "vladimir").
_INDIC = {
    # Devanagari consonants
    "क": "k", "ख": "kh", "ग": "g", "घ": "gh", "ङ": "n", "च": "ch",
    "छ": "ch", "ज": "j", "झ": "jh", "ञ": "n", "ट": "t", "ठ": "th",
    "ड": "d", "ढ": "dh", "ण": "n", "त": "t", "थ": "th", "द": "d",
    "ध": "dh", "न": "n", "प": "p", "फ": "ph", "ब": "b", "भ": "bh",
    "म": "m", "य": "y", "र": "r", "ल": "l", "व": "v", "श": "sh",
    "ष": "sh", "स": "s", "ह": "h", "ळ": "l", "ज़": "z", "फ़": "f",
    # Devanagari vowels + signs
    "अ": "a", "आ": "a", "इ": "i", "ई": "i", "उ": "u", "ऊ": "u",
    "ए": "e", "ऐ": "ai", "ओ": "o", "औ": "au", "ऋ": "ri",
    "ा": "a", "ि": "i", "ी": "i", "ु": "u", "ू": "u", "ृ": "ri",
    "े": "e", "ै": "ai", "ो": "o", "ौ": "au", "ं": "n", "ः": "h",
    "ँ": "n", "्": "",
    # Bengali consonants
    "ক": "k", "খ": "kh", "গ": "g", "ঘ": "gh", "ঙ": "n", "চ": "ch",
    "ছ": "ch", "জ": "j", "ঝ": "jh", "ঞ": "n", "ট": "t", "ঠ": "th",
    "ড": "d", "ঢ": "dh", "ণ": "n", "ত": "t", "থ": "th", "দ": "d",
    "ধ": "dh", "ন": "n", "প": "p", "ফ": "ph", "ব": "b", "ভ": "bh",
    "ম": "m", "য": "y", "র": "r", "ল": "l", "শ": "sh", "ষ": "sh",
    "স": "s", "হ": "h", "ড়": "r", "য়": "y",
    # Bengali vowels + signs
    "অ": "a", "আ": "a", "ই": "i", "ঈ": "i", "উ": "u", "ঊ": "u",
    "এ": "e", "ঐ": "ai", "ও": "o", "ঔ": "au",
    "া": "a", "ি": "i", "ী": "i", "ু": "u", "ূ": "u", "ে": "e",
    "ৈ": "ai", "ো": "o", "ৌ": "au", "ং": "n", "ঃ": "h", "ঁ": "n",
    "্": "",
    # Kannada consonants
    "ಕ": "k", "ಖ": "kh", "ಗ": "g", "ಘ": "gh", "ಙ": "n", "ಚ": "ch",
    "ಛ": "ch", "ಜ": "j", "ಝ": "jh", "ಞ": "n", "ಟ": "t", "ಠ": "th",
    "ಡ": "d", "ಢ": "dh", "ಣ": "n", "ತ": "t", "ಥ": "th", "ದ": "d",
    "ಧ": "dh", "ನ": "n", "ಪ": "p", "ಫ": "ph", "ಬ": "b", "ಭ": "bh",
    "ಮ": "m", "ಯ": "y", "ರ": "r", "ಲ": "l", "ವ": "v", "ಶ": "sh",
    "ಷ": "sh", "ಸ": "s", "ಹ": "h", "ಳ": "l",
    # Kannada vowels + signs
    "ಅ": "a", "ಆ": "a", "ಇ": "i", "ಈ": "i", "ಉ": "u", "ಊ": "u",
    "ಎ": "e", "ಏ": "e", "ಐ": "ai", "ಒ": "o", "ಓ": "o", "ಔ": "au",
    "ಾ": "a", "ಿ": "i", "ೀ": "i", "ು": "u", "ೂ": "u", "ೆ": "e",
    "ೇ": "e", "ೈ": "ai", "ೊ": "o", "ೋ": "o", "ೌ": "au", "ಂ": "m",
    "ಃ": "h", "್": "",
    # Burmese consonants + vowel signs (asat and medials simplified)
    "က": "k", "ခ": "kh", "ဂ": "g", "ဃ": "gh", "င": "n", "စ": "s",
    "ဆ": "hs", "ဇ": "z", "ည": "ny", "ဋ": "t", "ဌ": "ht", "ဍ": "d",
    "ဏ": "n", "တ": "t", "ထ": "ht", "ဒ": "d", "ဓ": "d", "န": "n",
    "ပ": "p", "ဖ": "hp", "ဗ": "b", "ဘ": "b", "မ": "m", "ယ": "y",
    "ရ": "r", "လ": "l", "ဝ": "w", "သ": "th", "ဟ": "h", "အ": "a",
    "ာ": "a", "ါ": "a", "ိ": "i", "ီ": "i", "ု": "u", "ူ": "u",
    "ေ": "e", "ဲ": "e", "ံ": "m", "ျ": "y", "ြ": "r", "ွ": "w",
    "ှ": "h", "်": "", "့": "", "း": "",
}


def _fold_kana_hangul(text: str) -> str:
    """Pre-pass over NFC text: romanise kana and Hangul syllables before
    NFKD can strip dakuten or scatter syllables into conjoining jamo."""
    out: list[str] = []
    double_next = False
    for ch in text:
        if ch in _KANA_SMALL_Y:
            # きゃ -> kya; しゃ/ちゃ/じゃ -> sha/cha/ja
            y = _KANA_SMALL_Y[ch]
            if out and out[-1].endswith("i"):
                prev = out[-1][:-1]
                if prev.endswith(("sh", "ch", "j")):
                    y = y[1:]
                out[-1] = prev + y
            else:
                out.append(y)
            continue
        if ch in _KANA_SOKUON:
            double_next = True
            continue
        if ch == "ー":  # long-vowel mark: repeat the previous vowel
            if out and out[-1] and out[-1][-1] in "aiueo":
                out[-1] += out[-1][-1]
            continue
        if ch in _KHMER_SHIFT:
            # series shifter: ប៉ sounds p; otherwise drop the sign
            if out and out[-1] == "b":
                out[-1] = "p"
            continue
        if ch in _KHMER_DROP:
            continue
        mapped = _KHMER_CONS.get(ch) or _KHMER_VOWEL.get(ch)
        if mapped is None:
            mapped = _INDIC.get(ch)
        if mapped is None:
            mapped = _KANA.get(ch)
        if mapped is None:
            mapped = _hangul(ch)
        if mapped is not None:
            if double_next and mapped:
                mapped = mapped[0] + mapped
            double_next = False
            out.append(mapped)
            continue
        double_next = False
        out.append(ch)
    return "".join(out)


# ISO-9-style single-character Cyrillic overrides.  The English-digraph
# table above (ч→ch, ш→sh, х→kh ...) matches how Slavic names are
# usually WRITTEN in Latin; the scientific convention maps one Cyrillic
# letter to one Latin letter (ч→č→c after diacritic strip), which is
# what makes the frozen run score "Вукић"~"Вучић" identically to
# "Vukić"~"Vučić" (0.8698) and "хүрэлчүх"~"хүрэлсүх" as an
# equal-length single-substitution pair (0.7656 = (7/8)²).  Names with
# Cyrillic are analysed under BOTH foldings (names_v2._analyze emits
# the ISO form as an extra alternate) and the matcher takes the max.
_TABLE_ISO: dict[str, str] = {
    **_TABLE,
    "ж": "z", "й": "j", "х": "h", "ц": "c", "ч": "c", "ш": "s",
    "щ": "s", "ю": "u", "я": "a", "э": "e",
    # Arabic matres lectionis read as vowels in the alternate: ya → i,
    # waw → o, alif maqsura → a ("ماري تيريز"~"Marie-Therese" gets
    # "mari tiriz" beside the consonantal "mary tyryz"; frozen 0.45)
    "ي": "i", "و": "o", "ى": "a",
}


def _fold(text: str, table: dict[str, str]) -> str:
    # NFKC (not NFC) before the kana/Hangul pre-pass: compatibility
    # forms that HIDE kana — circled katakana ㋐, halfwidth ｱ — only
    # surface under compatibility decomposition, and NFKC's recompose
    # step restores dakuten (か+゙ -> が) and Hangul syllables so the
    # pre-pass still sees whole characters.  With NFC the hidden kana
    # reached the main NFKD loop unromanised and folding was not
    # idempotent (found by hypothesis: fold('㋐') -> 'ア' -> 'a').
    text = _fold_kana_hangul(unicodedata.normalize("NFKC", text))
    out: list[str] = []
    # NFKD before lowercasing: compatibility forms (math alphabets,
    # fullwidth letters) decompose to cased base letters first, so one
    # fold pass reaches the fixpoint
    for ch in unicodedata.normalize("NFKD", text).lower():
        if unicodedata.combining(ch):
            continue
        mapped = table.get(ch)
        if mapped is not None:
            out.append(mapped)
            continue
        h = _hangul(ch)
        if h is not None:
            out.append(h)
            continue
        out.append(ch)
    return "".join(out)


@lru_cache(maxsize=200_000)
def fold_text(text: str) -> str:
    """Lowercase, strip diacritics, romanise known scripts.

    Unknown codepoints (CJK, Thai, ...) pass through so same-script
    comparison still works.
    """
    return _fold(text, _TABLE)


@lru_cache(maxsize=100_000)
def fold_text_iso(text: str) -> str:
    """Like ``fold_text`` but with the ISO-9-style single-character
    Cyrillic mapping — the secondary romanisation alternate."""
    return _fold(text, _TABLE_ISO)
