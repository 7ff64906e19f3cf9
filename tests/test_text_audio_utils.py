"""Unit tests for host-side utils: token encoder, Korean decomposition,
pitch transforms, alignment, MIDI parser round-trip."""

import numpy as np
import pytest

from visinger_tpu.utils.audio.align import get_mel2note, get_note2dur, mel2token_to_dur_np
from visinger_tpu.utils.audio.pitch import (
    denorm_f0,
    f0_to_coarse,
    norm_f0,
    norm_interp_f0,
)
from visinger_tpu.utils.midi import MidiFile, Note, write_midi
from visinger_tpu.utils.text.korean import (
    decompose_syllable,
    normalize_text,
    number_to_hangul,
    syllable_to_phonemes,
)
from visinger_tpu.utils.text.token_encoder import TokenTextEncoder, is_sil_phoneme


def test_token_encoder_reserved_and_oov():
    enc = TokenTextEncoder(["a", "b", "c"])
    assert enc.pad_index == 0 and enc.eos_index == 1 and enc.unk_index == 2
    assert enc.encode("a b") == [4, 5]
    assert enc.encode("a zz b") == [4, enc.unk_index, 5]
    assert enc.decode([4, 5, 0, 0], strip_padding=True) == "a b"
    assert len(enc) == 7


def test_sil_phoneme_detection():
    assert is_sil_phoneme("|")
    assert is_sil_phoneme("")
    assert not is_sil_phoneme("a")
    assert not is_sil_phoneme(chr(0x1100))  # jamo lead


def test_hangul_decomposition():
    lead, vowel, tail = decompose_syllable("한")
    assert (ord(lead), ord(vowel)) == (0x1112, 0x1161)
    assert tail is not None and ord(tail) == 0x11AB
    assert len(syllable_to_phonemes("가")) == 2  # no coda
    assert len(syllable_to_phonemes("강")) == 3


def test_number_to_hangul():
    assert number_to_hangul(0) == "영"
    assert number_to_hangul(1) == "일"
    assert number_to_hangul(10) == "십"
    assert number_to_hangul(123) == "백이십삼"
    assert number_to_hangul(10000) == "만"


def test_normalize_text():
    assert normalize_text("안녕 123") == "안녕 백이십삼"
    assert "에이" in normalize_text("a")


def test_f0_roundtrip():
    f0 = np.array([0.0, 100.0, 220.0, 440.0, 0.0, 880.0])
    norm, uv = norm_interp_f0(f0)
    np.testing.assert_array_equal(uv, [1, 0, 0, 0, 1, 0])
    assert np.isfinite(norm).all()
    denormed = denorm_f0(norm, uv=None)
    voiced = f0 > 0
    np.testing.assert_allclose(denormed[voiced], f0[voiced], rtol=1e-5)
    coarse = f0_to_coarse(f0)
    assert coarse.min() >= 1 and coarse.max() < 300
    assert coarse[3] > coarse[1]  # monotone in f0


def test_mel2token_to_dur_np():
    np.testing.assert_array_equal(
        mel2token_to_dur_np([1, 1, 2, 3, 3, 3], 4), [2, 1, 3, 0])


def _mk_midi_rows():
    # [Bar, Pos, Pitch, Dur, start, end, Tempo, ph_tokens, phones]
    return [
        [0, 0, 0, 0, 0.0, 0.1, 120, [5], ["<BOS>"]],
        [0, 1, 60, 8, 0.1, 0.5, 120, [10], ["ᄀ"]],
        [0, 2, 60, 8, 0.5, 0.9, 120, [11], ["ᅡ"]],
        [0, 3, 0, 0, 0.9, 1.0, 120, [6], ["<EOS>"]],
    ]


def test_get_mel2note():
    sr, hop = 24000, 300
    n_frames = int(1.0 * sr / hop + 0.5)
    mel2ph, mel2note, dur, ph_tok, ph, note_tok, cleaned = get_mel2note(
        _mk_midi_rows(), n_frames, hop, sr)
    assert len(mel2ph) == n_frames
    assert min(mel2ph) >= 1
    assert max(mel2ph) == len(ph_tok) == 4
    assert sum(dur) == n_frames
    # frame 0.3s -> note 2 (index 1 -> value 2)
    assert mel2ph[int(0.3 * sr / hop)] == 2


def test_get_note2dur_three_frame_rule():
    sr, hop = 24000, 300
    rows = [
        [0, 0, 60, 8, 0.0, 0.5, 120, ["ᄀ", "ᅡ", "ᆫ"], "간"],
        [0, 1, 62, 8, 0.5, 1.0, 120, ["ᄂ", "ᅡ"], "나"],
    ]
    mel2ph, mel2note, dur, ph_list, cleaned = get_note2dur(rows, hop, sr)
    assert len(ph_list) == 5
    # onset of first syllable: exactly 3 frames
    assert dur[0] == 3
    # coda of first syllable: 3 frames
    assert dur[2] == 3
    # onset of second syllable: 3 frames
    assert dur[3] == 3
    assert sum(dur) == len(mel2ph)


def test_midi_write_read_roundtrip(tmp_path):
    notes = [Note(0, 480, 60, 80), Note(480, 960, 64, 80), Note(960, 1920, 67, 80)]
    lyr = [(0, "가"), (480, "나"), (960, "다")]
    fn = str(tmp_path / "t.mid")
    write_midi(fn, notes, ticks_per_beat=480, tempo_bpm=120, lyrics=lyr)
    m = MidiFile(fn)
    assert m.ticks_per_beat == 480
    assert [(n.start, n.end, n.pitch) for n in m.notes] == \
        [(0, 480, 60), (480, 960, 64), (960, 1920, 67)]
    assert m.tempo_changes[0][1] == 500000
    assert [t for t, _ in m.lyrics] == [0, 480, 960]
    assert [s for _, s in m.lyrics] == ["가", "나", "다"]
    # tick->seconds: 480 ticks at 120bpm == 0.5 s
    t2s = m.tick_to_seconds()
    assert abs(t2s(480) - 0.5) < 1e-9


def test_save_wav_mp3_transcodes_and_cleans_up(tmp_path, monkeypatch):
    """save_wav('*.mp3') transcodes through ffmpeg and removes the
    intermediate wav (reference utils/audio/io.py:8-23).  The image ships no
    ffmpeg, so a stub on PATH stands in and records its invocation."""
    import os
    import stat

    import numpy as np

    from visinger_tpu.utils.audio.io import save_wav

    bin_dir = tmp_path / "bin"
    bin_dir.mkdir()
    log = tmp_path / "ffmpeg_args.txt"
    stub = bin_dir / "ffmpeg"
    stub.write_text("#!/bin/sh\n"
                    f'echo "$@" > "{log}"\n'
                    'for a in "$@"; do out="$a"; done\n'
                    'echo mp3 > "$out"\n')
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{bin_dir}:{os.environ['PATH']}")

    out = tmp_path / "song.mp3"
    save_wav(np.zeros(1000, np.float32), str(out), 24000)
    assert out.exists()
    assert not (tmp_path / "song.wav").exists()  # intermediate removed
    args = log.read_text()
    assert "-b:a 192k" in args and "song.wav" in args


def test_save_wav_mp3_without_ffmpeg_raises(tmp_path, monkeypatch):
    import numpy as np
    import pytest as _pytest

    from visinger_tpu.utils.audio.io import save_wav

    monkeypatch.setenv("PATH", str(tmp_path))  # empty PATH: no ffmpeg
    with _pytest.raises(RuntimeError, match="ffmpeg"):
        save_wav(np.zeros(100, np.float32), str(tmp_path / "x.mp3"), 24000)
