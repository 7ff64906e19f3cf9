"""Korean text utilities: Hangul jamo decomposition + singing-voice text
normalization.

Replaces the reference's g2pk/jamo dependency chain
(preprocessor/text/ko_sing.py) with self-contained code:
  - syllable -> (lead, vowel, tail) jamo via Unicode codepoint arithmetic
    (replaces jamo.h2j / h2j-based splitting)
  - number -> Hangul reading (sino-Korean), basic Latin-letter reading —
    the normalization role of the reference's korean.json dictionaries
  - the onset/nucleus/coda syllable split used by the 3-frame rule

Pronunciation rules (liaison, nasal assimilation, palatalization, ㅎ rules,
lateralization, tensification, coda neutralization) live in g2p_ko.py and
are applied by try_g2p; when a `g2pk` package is importable it takes
precedence (same hook point as the reference).
"""

from __future__ import annotations

import re

_HANGUL_BASE = 0xAC00
_N_LEADS, _N_VOWELS, _N_TAILS = 19, 21, 28
_LEAD_BASE, _VOWEL_BASE, _TAIL_BASE = 0x1100, 0x1161, 0x11A7

# jamo compatibility: lead index -> U+1100 block, vowel -> U+1161, tail -> U+11A8

_SINO_DIGITS = ["", "일", "이", "삼", "사", "오", "육", "칠", "팔", "구"]
_SINO_UNITS = ["", "십", "백", "천"]
_SINO_GROUPS = ["", "만", "억", "조", "경"]

_LATIN_READING = {
    "a": "에이", "b": "비", "c": "씨", "d": "디", "e": "이", "f": "에프",
    "g": "지", "h": "에이치", "i": "아이", "j": "제이", "k": "케이",
    "l": "엘", "m": "엠", "n": "엔", "o": "오", "p": "피", "q": "큐",
    "r": "알", "s": "에스", "t": "티", "u": "유", "v": "브이", "w": "더블유",
    "x": "엑스", "y": "와이", "z": "제트",
}


def is_hangul_syllable(ch: str) -> bool:
    return _HANGUL_BASE <= ord(ch) < _HANGUL_BASE + _N_LEADS * _N_VOWELS * _N_TAILS


def decompose_syllable(ch: str) -> tuple[str, str, str | None]:
    """'한' -> (lead, vowel, tail or None) as U+11xx jamo characters."""
    if not is_hangul_syllable(ch):
        raise ValueError(f"not a Hangul syllable: {ch!r}")
    code = ord(ch) - _HANGUL_BASE
    lead = code // (_N_VOWELS * _N_TAILS)
    vowel = (code % (_N_VOWELS * _N_TAILS)) // _N_TAILS
    tail = code % _N_TAILS
    return (
        chr(_LEAD_BASE + lead),
        chr(_VOWEL_BASE + vowel),
        chr(_TAIL_BASE + tail) if tail else None,
    )


def syllable_to_phonemes(ch: str) -> list[str]:
    """Syllable -> 1-3 jamo phonemes (onset, nucleus[, coda])."""
    lead, vowel, tail = decompose_syllable(ch)
    out = [lead, vowel]
    if tail is not None:
        out.append(tail)
    return out


def number_to_hangul(num: int) -> str:
    """Sino-Korean number reading (basic; covers the lyric use case)."""
    if num == 0:
        return "영"
    if num < 0:
        return "마이너스 " + number_to_hangul(-num)
    groups = []
    while num:
        groups.append(num % 10000)
        num //= 10000
    parts = []
    for gi in range(len(groups) - 1, -1, -1):
        g = groups[gi]
        if g == 0:
            continue
        s = ""
        for ui in range(3, -1, -1):
            d = (g // 10 ** ui) % 10
            if d == 0:
                continue
            digit = "" if (d == 1 and ui > 0) else _SINO_DIGITS[d]
            s += digit + _SINO_UNITS[ui]
        if gi >= 1 and s == "일":  # 일만 -> 만 (drop the leading 일)
            s = ""
        parts.append(s + _SINO_GROUPS[gi])
    return "".join(parts)


def normalize_text(text: str) -> str:
    """Lyric normalization: numbers and Latin letters -> Hangul readings,
    strip everything that is neither Hangul nor space."""
    text = re.sub(r"\d+", lambda m: number_to_hangul(int(m.group())), text)
    text = "".join(
        _LATIN_READING.get(c.lower(), c) if c.isascii() and c.isalpha() else c
        for c in text
    )
    text = re.sub(r"[^가-힣\s]", "", text)
    return re.sub(r"\s+", " ", text).strip()


_G2P_EXTERNAL = None


def try_g2p(text: str) -> str:
    """Apply Korean pronunciation rules: the g2pk package when importable
    (the reference's tool, ko_sing.py:5,176), otherwise the native
    rule engine (utils/text/g2p_ko.py — liaison, nasal assimilation,
    palatalization, ㅎ rules, lateralization, tensification, coda
    neutralization).  Length-preserving either way."""
    global _G2P_EXTERNAL
    if _G2P_EXTERNAL is None:
        try:
            from g2pk import G2p  # type: ignore

            _G2P_EXTERNAL = G2p()
        except ImportError:
            _G2P_EXTERNAL = False
    if _G2P_EXTERNAL:
        return _G2P_EXTERNAL(text)
    from visinger_tpu.utils.text.g2p_ko import g2p_syllables

    return g2p_syllables(text)
