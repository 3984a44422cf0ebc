"""Symbol lexicon for name analysis (T3) and symbolic name matching (C1).

The reference tags name parts with cultural symbols via rigour's data
tables (``nomenklatura/matching/logic_v2/names/analysis.py:13-31``,
``magic.py:8-63``) and the blocker emits ``sy:<category>:<id>`` tokens for
them (``nomenklatura/blocker/tokenizer.py:71-76``).  rigour's full tables
are a large cultural dataset this engine does not bundle; this module
re-expresses the *mechanism* with a compact, public lexicon:

- ``org`` (ORG_CLASS): legal-form tokens folded to a canonical class, so
  "limited"~"ltd" and "ooo"~"llc" pair symbolically.
- ``sym`` (SYMBOL): generic corporate vocabulary and its abbreviations
  ("international"~"intl", "group"~"grp").  Deliberately weak evidence
  (weight 0.3): "A B International" vs "X International" share it.
- ``dom`` (DOMAIN): industry-domain words ("medical", "casino") — a
  stronger signal than generic vocabulary (weight 0.7).
- ``num`` (NUMERIC): digits (incl. ordinal suffixes), roman numerals and
  number words, folded to the integer value: "Vessel 2"~"Vessel II".
  Weight 1.3 — "Vessel 1" vs "Vessel 2" are very different.
- ``nick`` (NICK): common given-name hypocorisms folded to the formal
  name ("bill"~"william").  Score 0.6 — a nickname pairing is real but
  weaker evidence than a literal/fuzzy surface match.
- INITIAL is structural (single letter vs. part initial), not a lexicon
  entry — handled directly in the matcher.

LOCATION symbols (reference weight 0.8) need a geographic gazetteer and
are not modelled; documented deviation (COVERAGE.md §2.3/§2.8).

Category scores/weights mirror the reference's tables
(``magic.py:SYM_SCORES/SYM_WEIGHTS/EXTRAS_WEIGHTS``).
"""

from __future__ import annotations

import re

# (score, weight) per category when a symbol pairs two name parts;
# extras weight applies when the symbol-tagged part is unmatched.
SYM_SCORES = {
    "org": 0.8,
    "init": 0.9,
    "nick": 0.6,
    "sym": 0.9,
    "dom": 0.9,
    "num": 0.9,
}
SYM_WEIGHTS = {
    "org": 0.7,
    "init": 0.5,
    "nick": 0.8,
    "sym": 0.3,
    "dom": 0.7,
    "num": 1.3,
}
EXTRAS_WEIGHTS = {"org": 0.7, "sym": 0.7, "num": 1.3}

# --- org classes: token -> canonical class ---------------------------------

_ORG_CLASSES: dict[str, list[str]] = {
    "ltd": ["ltd", "limited", "lda"],
    "llc": ["llc", "lc", "ooo", "sdn", "bhd"],
    "llp": ["llp"],
    "lp": ["lp"],
    "inc": ["inc", "incorporated"],
    "corp": ["corp", "corporation"],
    "co": ["co", "cia", "cie"],
    "plc": ["plc"],
    "ag": ["ag", "aktiengesellschaft"],
    "gmbh": ["gmbh", "mbh"],
    "sa": ["sa"],
    "sarl": ["sarl"],
    "sas": ["sas"],
    "srl": ["srl"],
    "spa": ["spa"],
    "bv": ["bv"],
    "nv": ["nv"],
    "oy": ["oy"],
    "ab": ["ab"],
    "as": ["as"],
    "kg": ["kg"],
    "kgaa": ["kgaa"],
    "ug": ["ug"],
    "jsc": ["jsc", "ao"],
    "pjsc": ["pjsc", "pao"],
    "ojsc": ["ojsc", "oao"],
    "cjsc": ["cjsc", "zao"],
    "pt": ["pt"],
    "pte": ["pte"],
    "pty": ["pty"],
    "foundation": ["foundation", "stiftung", "fond", "fondation", "fundacion"],
    "trust": ["trust"],
    "bank": ["bank", "banque", "banco", "banca"],
    "university": ["university", "universite", "universitat", "universidad", "univ"],
    "association": ["association", "assn", "verein", "asociacion"],
    "partnership": ["partnership"],
    "cooperative": ["cooperative", "coop"],
}

# --- generic corporate vocabulary: token -> group --------------------------

_SYMBOL_GROUPS: dict[str, list[str]] = {
    "international": ["international", "intl"],
    "technology": ["technology", "technologies", "tech"],
    "group": ["group", "grp", "gruppe", "groupe", "grupo"],
    "holding": ["holding", "holdings"],
    "industries": ["industries", "industrial"],
    "services": ["services", "service", "svcs"],
    "solutions": ["solutions"],
    "systems": ["systems", "system"],
    "engineering": ["engineering"],
    "management": ["management", "mgmt"],
    "investment": ["investment", "investments"],
    "enterprise": ["enterprise", "enterprises"],
    "trading": ["trading"],
    "global": ["global"],
    "national": ["national", "natl"],
    "general": ["general"],
    "development": ["development"],
    "manufacturing": ["manufacturing", "mfg"],
    "laboratories": ["laboratories", "labs"],
    "brothers": ["brothers", "bros"],
    "department": ["department", "dept"],
    "government": ["government", "govt"],
    "saint": ["saint", "st"],
    "mount": ["mount", "mt"],
    "fund": ["fund", "funds"],
    "capital": ["capital"],
    "partners": ["partners"],
    "consulting": ["consulting", "consultants"],
    "properties": ["properties", "property"],
}

# --- industry domains ------------------------------------------------------

_DOMAINS: dict[str, list[str]] = {
    "medical": ["medical", "healthcare", "clinic", "hospital"],
    "pharma": ["pharmaceuticals", "pharmaceutical", "pharma"],
    "casino": ["casino", "gaming"],
    "petroleum": ["petroleum", "oil", "gas"],
    "energy": ["energy", "power", "electric"],
    "airlines": ["airlines", "airways", "aviation"],
    "shipping": ["shipping", "maritime"],
    "insurance": ["insurance", "assurance"],
    "construction": ["construction"],
    "mining": ["mining"],
    "steel": ["steel"],
    "telecom": ["telecom", "telecommunications"],
    "media": ["media"],
    "hotel": ["hotel", "hotels"],
    "defense": ["defense", "defence"],
    "agriculture": ["agriculture", "agro"],
    "textile": ["textile", "textiles"],
    "automotive": ["automotive", "motors"],
    "electronics": ["electronics"],
    "logistics": ["logistics", "transport", "transportation"],
}

# --- numerics: number words and roman numerals -> integer value ------------
# Single-letter romans (i, v, x, ...) are excluded: they collide with
# initials, which the reference resolves via span context we don't model.

_NUM_WORDS = {
    "one": 1, "two": 2, "three": 3, "four": 4, "five": 5, "six": 6,
    "seven": 7, "eight": 8, "nine": 9, "ten": 10, "eleven": 11,
    "twelve": 12, "thirteen": 13, "fourteen": 14, "fifteen": 15,
    "sixteen": 16, "seventeen": 17, "eighteen": 18, "nineteen": 19,
    "twenty": 20, "thirty": 30, "forty": 40, "fifty": 50, "hundred": 100,
    "first": 1, "second": 2, "third": 3, "fourth": 4, "fifth": 5,
    "sixth": 6, "seventh": 7, "eighth": 8, "ninth": 9, "tenth": 10,
    "eleventh": 11, "twelfth": 12,
    "ii": 2, "iii": 3, "iv": 4, "vi": 6, "vii": 7, "viii": 8, "ix": 9,
    "xi": 11, "xii": 12, "xiii": 13, "xiv": 14, "xv": 15, "xvi": 16,
    "xvii": 17, "xviii": 18, "xix": 19, "xx": 20,
}

# --- nicknames: hypocorism -> formal given name ----------------------------

_NICKNAMES: dict[str, list[str]] = {
    "william": ["bill", "billy", "will", "willy", "liam"],
    "robert": ["bob", "bobby", "rob", "robbie", "robby"],
    "richard": ["dick", "rick", "ricky", "rich", "richie"],
    "james": ["jim", "jimmy", "jamie"],
    "john": ["jack", "johnny", "jon"],
    "michael": ["mike", "mikey", "misha"],
    "elizabeth": ["liz", "lizzie", "beth", "betty", "betsy", "eliza", "lisa"],
    "katherine": ["kate", "katie", "kathy", "katya", "kitty", "catherine"],
    "alexander": ["alex", "sasha"],
    "anthony": ["tony"],
    "andrew": ["andy", "drew"],
    "thomas": ["tom", "tommy"],
    "christopher": ["chris"],
    "daniel": ["dan", "danny"],
    "david": ["dave", "davey"],
    "edward": ["ed", "eddie", "ned"],
    "theodore": ["ted", "teddy"],
    "francis": ["frank", "frankie"],
    "frederick": ["fred", "freddie"],
    "gregory": ["greg"],
    "henry": ["harry", "hank", "hal"],
    "joseph": ["joe", "joey"],
    "kenneth": ["ken", "kenny"],
    "lawrence": ["larry"],
    "matthew": ["matt", "matty"],
    "nicholas": ["nick", "nicky", "kolya"],
    "patrick": ["pat"],
    "peter": ["pete", "petya"],
    "ronald": ["ron", "ronnie"],
    "samuel": ["sam", "sammy"],
    "stephen": ["steve", "stevie", "steven"],
    "vincent": ["vince", "vinny"],
    "walter": ["walt", "wally"],
    "raymond": ["ray"],
    "eugene": ["gene"],
    "gerald": ["jerry"],
    "jeffrey": ["jeff"],
    "joshua": ["josh"],
    "zachary": ["zach", "zack"],
    "benjamin": ["ben", "benny"],
    "abraham": ["abe"],
    "arthur": ["art", "artie"],
    "bernard": ["bernie"],
    "charles": ["charlie", "chuck"],
    "donald": ["don", "donnie"],
    "douglas": ["doug"],
    "herbert": ["herb"],
    "louis": ["lou", "louie"],
    "martin": ["marty"],
    "melvin": ["mel"],
    "norman": ["norm"],
    "philip": ["phil"],
    "russell": ["russ"],
    "sidney": ["sid"],
    "stanley": ["stan"],
    "stuart": ["stu"],
    "timothy": ["tim", "timmy"],
    "tobias": ["toby"],
    "wesley": ["wes"],
    "margaret": ["peggy", "meg", "maggie", "marge", "margie"],
    "mary": ["molly", "polly"],
    "sarah": ["sally"],
    "anne": ["nancy", "annie", "nan"],
    "susan": ["sue", "susie", "suzy"],
    "patricia": ["trish", "tricia"],
    "victoria": ["vicky"],
    "amanda": ["mandy"],
    "cynthia": ["cindy"],
    "deborah": ["debbie", "deb"],
    "jennifer": ["jen", "jenny"],
    "jessica": ["jess", "jessie"],
    "kimberly": ["kim"],
    "rebecca": ["becky"],
    "angela": ["angie"],
    "barbara": ["barb"],
    "constance": ["connie"],
    "dorothy": ["dot", "dottie"],
    "frances": ["fran"],
    "virginia": ["ginny"],
    "pamela": ["pam"],
    "vladimir": ["vova", "volodya"],
    "ivan": ["vanya"],
    "dmitry": ["dima"],
    "natalia": ["natasha"],
    "olga": ["olya"],
    "tatiana": ["tanya"],
    "yevgeny": ["zhenya"],
    "boris": ["borya"],
    "grigory": ["grisha"],
    "pavel": ["pasha"],
    "yuri": ["yura"],
    "jose": ["pepe"],
    "francisco": ["paco", "pancho"],
    "dolores": ["lola"],
    "guillermo": ["memo"],
    "ignacio": ["nacho"],
}


def _invert(groups: dict[str, list[str]], cat: str) -> dict[str, str]:
    out: dict[str, str] = {}
    for canon, toks in groups.items():
        out[canon] = f"{cat}:{canon}"  # canonical token tags itself
        for t in toks:
            out[t] = f"{cat}:{canon}"
    return out


# token -> "cat:id".  Build order sets precedence on (rare) collisions:
# org classes win over generic vocabulary.
TOKEN_SYMBOLS: dict[str, str] = {}
TOKEN_SYMBOLS.update(_invert(_NICKNAMES, "nick"))
TOKEN_SYMBOLS.update({t: f"num:{n}" for t, n in _NUM_WORDS.items()})
TOKEN_SYMBOLS.update(_invert(_DOMAINS, "dom"))
TOKEN_SYMBOLS.update(_invert(_SYMBOL_GROUPS, "sym"))
TOKEN_SYMBOLS.update(_invert(_ORG_CLASSES, "org"))

# 1-18 digits: stays in int64 range on every engine (longer digit runs
# are hashes/ids, not ordinals — not useful as numeric symbols anyway).
_NUM_RE = re.compile(r"^([0-9]{1,18})(st|nd|rd|th)?$")

# Categories the blocker indexes as sy: tokens.  INITIAL and SYMBOL are
# excluded, mirroring the reference (blocker/tokenizer.py:71-76): generic
# vocabulary is too common to block on, initials too ambiguous.
BLOCKER_CATEGORIES = ("org", "num", "nick", "dom")


def token_symbol(token: str) -> str | None:
    """Symbol id ("cat:id") for one normalized name token, or None."""
    m = _NUM_RE.match(token)
    if m is not None:
        return f"num:{int(m.group(1))}"
    return TOKEN_SYMBOLS.get(token)


def part_symbol_category(token: str) -> str | None:
    sym = token_symbol(token)
    return sym.split(":", 1)[0] if sym else None


# --- Spark / DuckDB constant-lexicon expressions ---------------------------

def blocker_symbol_map() -> dict[str, str]:
    """token -> symbol id, restricted to blocker-indexed categories."""
    return {
        t: s
        for t, s in TOKEN_SYMBOLS.items()
        if s.split(":", 1)[0] in BLOCKER_CATEGORIES
    }


def symbol_token_col(tok):
    """Column expr: normalized name token -> "cat:id" symbol or NULL.

    The lexicon rides as a constant-folded map literal (a few hundred
    entries — ConstantFolding collapses ``CreateMap`` of literals once,
    then per-row lookup; no shuffle, no UDF).  Digits (with optional
    ordinal suffix) fold to the integer value via regexp.
    """
    from pyspark.sql import functions as F

    # One parsed map literal (tokens are lowercase alphanumerics, no
    # escaping needed) — building it from F.lit pairs costs a py4j
    # round-trip per literal.
    entries = blocker_symbol_map()
    items = ",".join(f"'{t}','{s}'" for t, s in entries.items())
    lex = F.expr(f"map({items})")
    digits = F.regexp_extract(tok, r"^([0-9]{1,18})(st|nd|rd|th)?$", 1)
    return F.when(
        digits != "",
        F.concat(F.lit("num:"), digits.cast("bigint").cast("string")),
    ).otherwise(F.element_at(lex, tok))


def symbol_sql_expr(tok_expr: str) -> str:
    """DuckDB expression mirroring ``symbol_token_col`` for the oracle."""
    entries = blocker_symbol_map()
    pairs = ", ".join(
        f"'{t}': '{s}'" for t, s in sorted(entries.items())
    )
    return (
        f"CASE WHEN regexp_matches({tok_expr}, '^[0-9]{{1,18}}(st|nd|rd|th)?$') "
        f"THEN 'num:' || CAST(CAST(regexp_replace({tok_expr}, "
        f"'(st|nd|rd|th)$', '') AS BIGINT) AS VARCHAR) "
        f"ELSE map_extract(MAP {{{pairs}}}, {tok_expr})[1] END"
    )
