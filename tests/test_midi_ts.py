"""Time-signature/tempo-aware MIDI encoding tests.

Parity target: reference MIDI_to_encoding's pos_to_info table
(base_preprocessor.py:166-246) — time_signature_reduce, TS-aware bar
numbering, TS-dependent min_sil threshold, tempo-change tracking — which
round 1 approximated with fixed 4/4 bars and a first-tempo threshold.
"""

import numpy as np
import pytest

from visinger_tpu.data.preprocess import (
    build_pos_to_info,
    midi_to_encoding,
    time_signature_reduce,
)
from visinger_tpu.utils.midi import MidiFile, Note, write_midi

ARGS = {
    "pos_resolution": 16,
    "min_sil_dur": 8,
    "max_ts_denominator": 6,
    "max_notes_per_bar": 2,
    "beat_note_factor": 4,
    "DEFAULT_TEMPO": 120,
}


def _roundtrip(tmp_path, notes, **kw) -> MidiFile:
    fn = str(tmp_path / "t.mid")
    write_midi(fn, notes, **kw)
    return MidiFile(fn)


def test_time_signature_reduce():
    # no-ops within limits
    assert time_signature_reduce(4, 4) == (4, 4)
    assert time_signature_reduce(6, 8) == (6, 8)
    # halving while denominator exceeds 2**6
    assert time_signature_reduce(128, 128) == (64, 64)
    # numerator decomposition when a bar exceeds max_notes_per_bar whole notes
    assert time_signature_reduce(12, 4) == (6, 4)
    assert time_signature_reduce(9, 4) == (3, 4)


def test_three_four_bar_numbering(tmp_path):
    # 3/4 at tpb 480: a bar is 3 beats = 48 positions, not 4/4's 64
    notes = [Note(0, 480, 60, 80), Note(1440, 1920, 62, 80),
             Note(2880, 3360, 64, 80)]
    midi = _roundtrip(tmp_path, notes, time_signatures=[(0, 3, 4)])
    rows, _sil, _text = midi_to_encoding(midi, ARGS,
                                         lyrics=["가", "나", "다"])
    sung = [r for r in rows if r[7] not in ("", "|")]
    assert [r[0] for r in sung] == [0, 1, 2]


def test_time_signature_change_bars(tmp_path):
    # two 4/4 bars (2 * 4 * 480 ticks) then 3/4: the note one 3/4 bar after
    # the change lands in bar 3
    change_tick = 2 * 4 * 480
    notes = [Note(0, 480, 60, 80),
             Note(change_tick, change_tick + 480, 62, 80),
             Note(change_tick + 3 * 480, change_tick + 4 * 480, 64, 80)]
    midi = _roundtrip(tmp_path, notes,
                      time_signatures=[(0, 4, 4), (change_tick, 3, 4)])
    rows, _sil, _text = midi_to_encoding(midi, ARGS,
                                         lyrics=["가", "나", "다"])
    sung = [r for r in rows if r[7] not in ("", "|")]
    assert [r[0] for r in sung] == [0, 2, 3]


def test_mid_bar_ts_change_defers_to_next_bar(tmp_path):
    # a TS change off the bar grid takes effect at the NEXT bar boundary:
    # the reference recomputes measure_length only at cnt == 0
    # (base_preprocessor.py:218-226), so its mid-bar assert is unreachable
    notes = [Note(0, 480, 60, 80), Note(960, 1440, 62, 80)]
    midi = _roundtrip(tmp_path, notes,
                      time_signatures=[(0, 4, 4), (480, 3, 4)])
    bar, ts, _pos_in_bar, _tempo = build_pos_to_info(midi, ARGS, 128)
    assert ts[16] == (3, 4)  # signature switches at pos 16 (tick 480)...
    assert bar[63] == 0 and bar[64] == 1  # ...but bar 0 still spans 64 pos
    assert bar[111] == 1 and bar[112] == 2  # bar 1 is 3/4 (48 positions)


def test_min_sil_depends_on_time_signature(tmp_path):
    # gap of 180 ticks (0.1875 s at 120 bpm): under 4/4 the threshold is
    # 240 ticks (8th note) -> gap absorbed; under 6/8 it halves to 120
    # ticks -> a "|" silence row is inserted (base_preprocessor.py:240)
    notes = [Note(0, 480, 60, 80), Note(660, 1140, 62, 80)]
    lyr = ["가", "나"]
    midi44 = _roundtrip(tmp_path, notes, time_signatures=[(0, 4, 4)])
    rows44, sil44, text44 = midi_to_encoding(midi44, ARGS, lyrics=lyr)
    midi68 = _roundtrip(tmp_path, notes, time_signatures=[(0, 6, 8)])
    rows68, sil68, text68 = midi_to_encoding(midi68, ARGS, lyrics=lyr)
    assert sil68 == pytest.approx(sil44 / 2)
    assert [r[7] for r in rows44] == ["가", "나"]
    assert [r[7] for r in rows68] == ["가", "|", "나"]
    assert text44 == "가나" and text68 == "가 나"


def test_tempo_change_tracked(tmp_path):
    # 120 bpm for one bar, then 60 bpm: the later note reports tempo 60 and
    # its second timestamps stretch accordingly
    notes = [Note(0, 480, 60, 80), Note(1920, 2400, 62, 80)]
    midi = _roundtrip(tmp_path, notes,
                      tempo_changes=[(0, 120.0), (1920, 60.0)])
    rows, _sil, _text = midi_to_encoding(midi, ARGS, lyrics=["가", "나"])
    sung = [r for r in rows if r[7] not in ("", "|")]
    assert sung[0][6] == 120 and sung[1][6] == 60
    # tick 1920 = 4 beats at 120 bpm = 2.0 s; the next 480 ticks take 1.0 s
    assert sung[1][4] == pytest.approx(2.0)
    assert sung[1][5] == pytest.approx(3.0)


def test_positional_lyric_pairing(tmp_path):
    # lyric events slightly off the note grid still pair positionally when
    # counts match (the reference indexes midi_obj.lyrics[i])
    notes = [Note(0, 480, 60, 80), Note(480, 960, 62, 80)]
    midi = _roundtrip(tmp_path, notes, lyrics=[(3, "가"), (483, "나")])
    rows, _sil, _text = midi_to_encoding(midi, ARGS, lyrics=None)
    assert [r[7] for r in rows] == ["가", "나"]


def test_pos_to_info_tempo_default():
    # no tempo/TS meta events at all -> defaults (4/4, DEFAULT_TEMPO)
    notes = [Note(0, 480, 60, 80)]
    midi = MidiFile.__new__(MidiFile)  # hand-built: no meta events
    midi.ticks_per_beat = 480
    midi.notes = notes
    midi.tempo_changes = [(0, 500000)]
    midi.time_signatures = [(0, 4, 4)]
    midi.lyrics = []
    bar, ts, pos_in_bar, tempo = build_pos_to_info(midi, ARGS, 128)
    assert bar[0] == 0 and bar[64] == 1 and bar[127] == 1
    assert pos_in_bar[64] == 0 and pos_in_bar[65] == 1
    assert all(t == 120 for t in tempo)
    assert all(x == (4, 4) for x in ts)
