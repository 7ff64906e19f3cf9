"""End-to-end verify drive: raw corpus -> preprocess -> binarize -> train ->
resume -> infer (per .claude/skills/verify/SKILL.md)."""
import os
import shutil
import sys

import numpy as np

ROOT = "/tmp/verify_run"
shutil.rmtree(ROOT, ignore_errors=True)
RAW = os.path.join(ROOT, "raw")
os.makedirs(os.path.join(RAW, "midi"), exist_ok=True)
os.makedirs(os.path.join(RAW, "wav"), exist_ok=True)

from visinger_tpu.data.synthetic_corpus import _render_note, midi_to_hz
from visinger_tpu.utils.audio.io import save_wav
from visinger_tpu.utils.midi import MidiFile, Note, write_midi

SR = 24000
SYLLABLES = list("나무소리가장하늘바다국물빛별들꽃잎물과")
rng = np.random.RandomState(7)

n_items = 8
for i in range(n_items):
    tpb = 480
    n_notes = int(rng.randint(5, 8))
    notes, lyr = [], []
    tick = 0
    for j in range(n_notes):
        dur = int(rng.randint(300, 700))
        pitch = int(rng.randint(55, 76))
        notes.append(Note(tick, tick + dur, pitch, 80))
        lyr.append((tick, str(rng.choice(SYLLABLES))))
        tick += dur + (120 if rng.rand() < 0.3 else 0)  # occasional gaps
    kw = {}
    if i == 0:
        kw["time_signatures"] = [(0, 3, 4)]  # non-4/4 score
    if i == 1:
        kw["tempo_changes"] = [(0, 120.0), (960, 90.0)]  # tempo change
    fn = os.path.join(RAW, "midi", f"song_{i:03d}.mid")
    write_midi(fn, notes, ticks_per_beat=tpb, lyrics=lyr, **kw)
    # render audio honoring the written tempo map
    midi = MidiFile(fn)
    t2s = midi.tick_to_seconds()
    end_s = t2s(notes[-1].end) + 0.3
    wav = np.zeros(int(end_s * SR) + SR // 10)
    for n in midi.notes:
        s0, s1 = int(t2s(n.start) * SR), int(t2s(n.end) * SR)
        wav[s0:s1] += _render_note(midi_to_hz(n.pitch), s1 - s0, SR, rng)
    save_wav(wav, os.path.join(RAW, "wav", f"song_{i:03d}.wav"), SR)

# corrupt-MIDI probe: preprocessor must skip it, not die
with open(os.path.join(RAW, "midi", "song_bad.mid"), "wb") as f:
    f.write(b"MThd\x00\x00\x00\x06garbage-not-a-midi")

from visinger_tpu.models.factory import tiny_config

cfg = tiny_config().replace(
    raw_data_dir=RAW,
    processed_data_dir=os.path.join(ROOT, "processed"),
    binary_data_dir=os.path.join(ROOT, "binary"),
    work_dir=os.path.join(ROOT, "work"),
    frame_buckets=[512], token_buckets=[64], max_frames=512,
    max_sentences=2, max_tokens=2000,
    tb_log_interval=4, val_check_interval=10, ckpt_save_interval=10,
    eval_max_batches=2, num_sanity_val_steps=1, steps_per_epoch=0,
    deterministic_eval=True, logs_clamp=5.0,
)
cfg = cfg.replace(binarization_args=cfg.binarization_args.to_dict() | {
    "train_range": [2, -1], "valid_range": [1, 2], "test_range": [0, 1],
    "min_text": 2})

from visinger_tpu.data.preprocess import Preprocessor

meta_fn = Preprocessor(cfg).process()
import json

meta = json.load(open(meta_fn))
assert len(meta) == n_items, f"expected {n_items} items, got {len(meta)}"
phones = set(json.load(open(os.path.join(ROOT, "processed", "phone_set.json"))))
jamo = [p for p in phones if len(p) == 1 and 0x1100 <= ord(p) <= 0x11FF]
assert len(jamo) > 10, f"jamo phones missing: {sorted(phones)[:20]}"
print(f"| OK preprocess: {len(meta)} items, {len(jamo)} jamo phones")

from visinger_tpu.data.binarizer import Binarizer

Binarizer(cfg).process()
for split in ("train", "valid", "test"):
    assert os.path.exists(os.path.join(ROOT, "binary", f"{split}.data")), split
print("| OK binarize")

from visinger_tpu.training.trainer import Trainer

tr = Trainer(cfg)
state = tr.fit(max_updates=12)
import glob

ckpts = glob.glob(os.path.join(ROOT, "work", "model_ckpt_steps_*"))
assert ckpts, "no checkpoints written"
print(f"| OK train: ckpts={sorted(os.path.basename(c) for c in ckpts)}")

tr2 = Trainer(cfg)
state2 = tr2.fit(max_updates=14)
assert int(np.asarray(state2.step)) == 14, int(np.asarray(state2.step))
print("| OK resume to 14")

log = [json.loads(l) for l in open(os.path.join(ROOT, "work", "log.jsonl"))]
val = [r for r in log if r.get("prefix") == "val"]
assert val and np.isfinite(val[-1]["val_loss"]), val
print(f"| OK val logged: {val[-1]}")

from visinger_tpu.infer.infer import VISingerInfer

inf = VISingerInfer(cfg, state2.params_g)
out_fn = os.path.join(ROOT, "out.wav")
rtf = inf.to_file(os.path.join(RAW, "midi", "song_002.mid"), out_fn)
assert os.path.getsize(out_fn) > 1000
print(f"| OK infer: {os.path.getsize(out_fn)} bytes, RTF {rtf:.2f}")
rtf2 = inf.to_file(os.path.join(RAW, "midi", "song_002.mid"),
                   os.path.join(ROOT, "out_p4.wav"), pitch_control=4)
print(f"| OK pitch_control=4: RTF {rtf2:.2f}")

# sequence-parallel serving: same score, frame axis sharded over all devices
import jax

inf_sp = VISingerInfer(cfg.replace(sp_infer=True), state2.params_g)
assert inf_sp._sp_mesh is not None and len(jax.devices()) > 1
sp_fn = os.path.join(ROOT, "out_sp.wav")
rtf3 = inf_sp.to_file(os.path.join(RAW, "midi", "song_002.mid"), sp_fn)
print(f"| OK sp_infer over {len(jax.devices())} devices: RTF {rtf3:.2f}")
a = open(out_fn, "rb").read(); b = open(sp_fn, "rb").read()
assert len(a) == len(b)
wa = np.frombuffer(a[44:], np.int16).astype(np.float32)
wb = np.frombuffer(b[44:], np.int16).astype(np.float32)
assert np.abs(wa - wb).max() <= 2, np.abs(wa - wb).max()  # int16 LSB noise
print("| OK sp_infer waveform matches single-device")
print("VERIFY DRIVE PASSED")
