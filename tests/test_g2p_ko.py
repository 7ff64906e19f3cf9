"""Golden-example tests for the native Korean pronunciation rules
(utils/text/g2p_ko.py) and their wiring into preprocessing.

The examples are standard-pronunciation (표준발음법) textbook cases covering
every rule the reference's g2pk dependency applies in ko_sing.py:176.
"""

import pytest

from visinger_tpu.data.preprocess import phonemize_rows
from visinger_tpu.utils.text.g2p_ko import g2p_syllables
from visinger_tpu.utils.text.korean import normalize_text, try_g2p

GOLDEN = [
    # liaison (연음)
    ("밥을", "바블"),
    ("있어", "이써"),
    ("읽어", "일거"),
    ("앉아", "안자"),
    ("옷이", "오시"),
    ("없어", "업써"),
    ("값이", "갑씨"),
    # palatalization (구개음화)
    ("같이", "가치"),
    ("굳이", "구지"),
    ("닫히다", "다치다"),
    # ㅎ rules
    ("좋아", "조아"),
    ("많아", "마나"),
    ("좋다", "조타"),
    ("좋고", "조코"),
    ("싫어", "시러"),
    ("입학", "이팍"),
    ("축하", "추카"),
    ("좋소", "조쏘"),
    # nasal assimilation (비음화)
    ("국물", "궁물"),
    ("닫는", "단는"),
    ("밥물", "밤물"),
    ("종로", "종노"),
    ("막론", "망논"),
    ("입니다", "임니다"),
    # lateralization (유음화)
    ("신라", "실라"),
    ("설날", "설랄"),
    # post-obstruent tensification (경음화)
    ("국밥", "국빱"),
    ("학교", "학꾜"),
    ("닫고", "닫꼬"),
    # coda neutralization (평폐쇄음화)
    ("옷", "옫"),
    ("값", "갑"),
    ("부엌", "부억"),
    ("잎", "입"),
    ("삶", "삼"),
]


@pytest.mark.parametrize("src,expect", GOLDEN)
def test_golden_pronunciations(src, expect):
    assert g2p_syllables(src) == expect


def test_length_preserving_and_boundaries():
    # non-Hangul characters pass through and block cross-boundary rules
    assert g2p_syllables("국|물") == "국|물"[0] + "|" + "물"  # no nasalization
    assert len(g2p_syllables("같이 좋아")) == len("같이 좋아")


def test_try_g2p_uses_native_rules():
    # g2pk is absent in this image, so try_g2p routes to the native engine
    assert try_g2p("국물") == "궁물"


def test_phonemize_rows_normalizes_and_crosses_notes():
    # one syllable per note: g2p must apply ACROSS note boundaries within a
    # word ("국" + "물" notes -> 궁/물), and numbers normalize to Hangul
    rows = [[0, 0, 60, 4, 0.0, 0.5, 120, "국"],
            [0, 4, 62, 4, 0.5, 1.0, 120, "물"],
            [0, 8, 0, 0, 1.0, 1.2, 120, "|"],
            [0, 12, 64, 4, 1.2, 1.7, 120, "5"]]
    syls = phonemize_rows(rows)
    assert syls == ["궁", "물", "|", "오"]


def test_phonemize_rows_silence_blocks_rules():
    # the same consonant pair across a silence must NOT assimilate
    rows = [[0, 0, 60, 4, 0.0, 0.5, 120, "국"],
            [0, 4, 0, 0, 0.5, 1.0, 120, "|"],
            [0, 8, 62, 4, 1.0, 1.5, 120, "물"]]
    assert phonemize_rows(rows) == ["국", "|", "물"]


def test_normalize_text_numbers_latin():
    assert normalize_text("3") == "삼"
    assert normalize_text("b") == "비"


LEXICAL_GOLDEN = [
    # 밟- exception (제10항 단서)
    ("밟다", "밥따"),
    ("밟고", "밥꼬"),
    ("밟는", "밤는"),
    # 넓죽/넓둥 compounds
    ("넓죽", "넙쭉"),
    ("넓둥", "넙뚱"),
    ("넓다", "널따"),        # default ㄼ -> ㄹ elsewhere
    # ㄺ + ㄱ (제11항 단서)
    ("맑게", "말께"),
    ("읽고", "일꼬"),
    ("묽고", "물꼬"),
    ("닭", "닥"),            # default ㄺ -> ㄱ elsewhere
    ("맑다", "막따"),
    # compound ㄴ-insertion (제29항 lexicon)
    ("꽃잎", "꼰닙"),
    ("솜이불", "솜니불"),
    ("색연필", "생년필"),
    ("한여름", "한녀름"),
    ("담요", "담뇨"),
    ("막일", "망닐"),
    ("식용유", "시굥뉴"),
]


@pytest.mark.parametrize("src,expect", LEXICAL_GOLDEN)
def test_lexical_exceptions(src, expect):
    """The g2pk-grade lexical exceptions (VERDICT r2 #6 / missing #3)."""
    assert g2p_syllables(src) == expect


NUMBER_GOLDEN = [
    # reference num_to_hangeul scope (preprocessor/text/ko_sing.py:92-165)
    ("3.5", "삼쩜 오"),
    ("0.5", "영쩜 오"),
    ("2.04", "이쩜 영사"),
    ("-7", "마이너스 칠"),
    ("+2", "플러스 이"),
    ("007", "공공칠"),
    ("1,234", "천이백삼십사"),
    ("12,345,678", "천이백삼십사만오천육백칠십팔"),
    # native-Korean count readings before counter words (count_checker)
    ("3마리", "세마리"),
    ("1살", "한살"),
    ("11살", "열한살"),
    ("20명", "스물명"),
    ("32송이", "서른두송이"),
    ("102마리", "백이마리"),   # >2 digits fall back to sino (reference rule)
    ("3시", "세시"),
    ("5개월", "오개월"),       # 개(?!월): 개월 is NOT a native counter
    ("3 개", "삼 개"),         # counter must be ADJACENT (reference
                               # count_checker): spaced counts read sino
    # measurement units (unit_dict)
    ("5km", "오킬로미터"),
    ("100%", "백퍼센트"),
    ("36.5℃", "삼십육쩜 오도"),
]


@pytest.mark.parametrize("src,expect", NUMBER_GOLDEN)
def test_number_normalization_golden(src, expect):
    """Floats, signs, leading zeros, native count readings and units
    (VERDICT r2 #6; reference korean.json + num_to_hangeul)."""
    assert normalize_text(src) == expect
