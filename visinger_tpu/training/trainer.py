"""Training runtime: the epoch/step loop around the fused train step.

Replaces the reference Trainer + BaseTask + VISingerTask runtime
(utils/commons/trainer.py:46-304, tasks/visinger.py:18-227) with a compact
loop: bucketed static-shape batches -> sharded device put -> fused jitted
step; validation + checkpoint every ``val_check_interval``; JSONL metric log
(+ TensorBoard when torch is importable); loss meters averaged per log
window.  Multi-host: process-0 does IO, every process feeds its own shard.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from visinger_tpu.data.dataset import build_dataset, batch_by_size
from visinger_tpu.models.factory import build_models
from visinger_tpu.parallel import make_mesh, shard_batch
from visinger_tpu.training.checkpoint import restore_latest, save_checkpoint
from visinger_tpu.training.train_state import create_train_state
from visinger_tpu.training.train_step import (
    make_eval_step,
    make_train_step,
    recon_loss_total,
)
from visinger_tpu.utils.text.token_encoder import build_token_encoder


class MetricLogger:
    def __init__(self, work_dir: str):
        self.path = os.path.join(work_dir, "log.jsonl")
        os.makedirs(work_dir, exist_ok=True)
        self._tb = None
        try:  # TensorBoard via torch (cpu) when available
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(os.path.join(work_dir, "tb"))
        except Exception:
            pass

    def log(self, step: int, metrics: dict, prefix: str = "train"):
        rec = {"step": step, "prefix": prefix,
               **{k: float(v) for k, v in metrics.items()}}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(f"{prefix}/{k}", float(v), step)

    # TB media (reference save_valid_result/plot_mel pushes rendered audio
    # and mel figures into TensorBoard, tasks/visinger.py:175-185 +
    # tasks/base.py:249-271) — no-ops when TB is unavailable.
    def add_audio(self, tag: str, wav, step: int, sample_rate: int):
        if self._tb is None:
            return
        import torch

        w = torch.from_numpy(np.asarray(wav, np.float32)).clamp(-1.0, 1.0)
        self._tb.add_audio(tag, w.unsqueeze(0), step, sample_rate=sample_rate)

    def add_figure(self, tag: str, fig, step: int):
        if self._tb is None:
            return
        self._tb.add_figure(tag, fig, step)
        import matplotlib.pyplot as plt

        plt.close(fig)


class Trainer:
    def __init__(self, cfg, work_dir: str | None = None):
        self.cfg = cfg
        self.work_dir = work_dir or cfg.work_dir
        # concat training (binary_data_dirs): the consistency check
        # guarantees every corpus shares dictionaries, so read the first's
        data_dir = (list(cfg.binary_data_dirs)[0]
                    if cfg.get("binary_data_dirs") else cfg.binary_data_dir)
        self.token_encoder = build_token_encoder(f"{data_dir}/phone_set.json")
        with open(f"{data_dir}/pitch_map.json") as f:
            pitch_map = json.load(f)
        with open(f"{data_dir}/dur_map.json") as f:
            dur_map = json.load(f)
        self.model, self.disc = build_models(
            cfg, ph_vocab=len(self.token_encoder),
            pitch_vocab=len(pitch_map), dur_vocab=len(dur_map))
        # DP mesh: the batch axis must divide evenly; use the largest device
        # count that divides the per-step batch (max_sentences, since batches
        # are padded to it).
        n_dev = len(jax.devices())
        bs = int(cfg.max_sentences)
        k = max(d for d in range(1, n_dev + 1) if bs % d == 0 and d <= n_dev)
        if k < n_dev and jax.process_index() == 0:
            print(f"| DP mesh uses {k}/{n_dev} devices (batch {bs} not "
                  f"divisible by {n_dev})")
        self.mesh = make_mesh(jax.devices()[:k])
        self.logger = MetricLogger(self.work_dir) if jax.process_index() == 0 else None
        self._render_fn = None

    def _put_batch(self, batch: dict) -> dict:
        """Host batch -> device arrays sharded over the DP mesh.  Multi-host:
        every process builds the same global batch deterministically and
        contributes its contiguous slice (parallel/multihost.py)."""
        if jax.process_count() > 1:
            from visinger_tpu.parallel.multihost import (
                global_batch_from_local,
                host_batch_slice,
            )

            sl = host_batch_slice(next(iter(batch.values())).shape[0])
            local = {k: v[sl] for k, v in batch.items()}
            return global_batch_from_local(local, self.mesh)
        return shard_batch(batch, self.mesh)

    # ------------------------------------------------------------------
    def _init_state(self, example_batch: dict):
        from visinger_tpu.models.factory import init_params

        params_g, params_d = init_params(self.cfg, self.model, self.disc,
                                         example_batch)
        return create_train_state(self.cfg, params_g, params_d,
                                  jax.random.PRNGKey(self.cfg.seed))

    # ------------------------------------------------------------------
    def fit(self, max_updates: int | None = None):
        cfg = self.cfg
        max_updates = max_updates or cfg.max_updates
        train_ds = build_dataset(cfg, cfg.train_set_name)
        valid_ds = build_dataset(cfg, cfg.valid_set_name)
        if jax.process_index() == 0 and cfg.get("save_codes", True):
            self._snapshot_code()
        first = next(train_ds.batches(shuffle=False))
        state = self._init_state(first)
        state, start_step = restore_latest(self.work_dir, state)
        if start_step and jax.process_index() == 0:
            print(f"| resumed from step {start_step}")
        if not start_step and cfg.get("load_ckpt", ""):
            from visinger_tpu.training.checkpoint import warm_start

            state = warm_start(cfg.load_ckpt, state)
        # Per-epoch LR decay uses the ACTUAL epoch plan length (the reference
        # steps ExponentialLR once per epoch, tasks/visinger.py:221-227);
        # cfg.steps_per_epoch > 0 still overrides (see make_optimizers).
        lengths = np.asarray([train_ds.item_length(i)
                              for i in range(len(train_ds))])
        steps_per_epoch = max(
            len(batch_by_size(lengths, cfg.max_tokens, cfg.max_sentences)), 1)
        train_step = make_train_step(cfg, self.model, self.disc,
                                     steps_per_epoch=steps_per_epoch)
        # async_checkpoint: true moves the device->host transfer + msgpack
        # write off the step loop (training/checkpoint.py:AsyncCheckpointer)
        ckpt_async = None
        if cfg.get("async_checkpoint", False):
            from visinger_tpu.training.checkpoint import AsyncCheckpointer

            ckpt_async = AsyncCheckpointer()

        def save_ckpt(state, val_loss=None):
            if ckpt_async is not None:
                ckpt_async.save(self.work_dir, state,
                                num_keep=cfg.num_ckpt_keep, val_loss=val_loss)
            else:
                save_checkpoint(self.work_dir, state,
                                num_keep=cfg.num_ckpt_keep, val_loss=val_loss)

        # One dispatch per step: metric-meter accumulation happens INSIDE the
        # jitted program (every separately dispatched op costs a full relay
        # round-trip on tunneled TPUs — a dozen tiny meter adds per step more
        # than 10x'd the step time).
        def step_with_meters(state, meters, batch):
            new_state, metrics = train_step(state, batch)
            return new_state, jax.tree.map(jnp.add, meters, metrics)

        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(self.mesh, P())
        data = NamedSharding(self.mesh, P("data"))
        step_fn = jax.jit(step_with_meters,
                          in_shardings=(repl, repl, data),
                          out_shardings=(repl, repl),
                          donate_argnums=(0, 1))

        # metrics pytree structure (host-side zeros template; cheap transfer)
        metrics_shape = jax.eval_shape(train_step, state, first)[1]
        zero_meters = lambda: {k: np.zeros((), np.float32)  # noqa: E731
                               for k in metrics_shape}

        # Device-resident data plane: upload the whole split once; per step
        # only a [B] index vector crosses the wire and batch assembly
        # (gather + static bucket slice) runs inside the compiled program.
        # See data/device_store.py for why this matters on tunneled TPUs.
        use_store = bool(cfg.get("device_resident_data", True))
        if jax.process_count() > 1:
            # multi-host feeds per-process shards through _put_batch /
            # global_batch_from_local (parallel/multihost.py); the device
            # store's whole-split upload is a single-controller design
            use_store = False
            if jax.process_index() == 0:
                print("| device store disabled (multi-host run)")
        est_mb = len(train_ds) * max(cfg.frame_buckets) * cfg.hop_size * 4 / 1e6
        if est_mb > float(cfg.get("device_data_max_mb", 4096)):
            use_store = False
            if jax.process_index() == 0:
                print(f"| device store disabled ({est_mb:.0f} MB > cap)")
        if use_store:
            from visinger_tpu.data.device_store import DeviceStore, gather_batch

            single_dev = len(self.mesh.devices.flat) == 1
            idx_sharding = None if single_dev else NamedSharding(self.mesh, P("data"))
            store_sharding = None if single_dev else repl
            put_idx = (jax.device_put if single_dev
                       else (lambda i: jax.device_put(i, idx_sharding)))
            train_store = DeviceStore(train_ds, sharding=store_sharding)
            valid_store = DeviceStore(valid_ds, sharding=store_sharding)

            def step_store(state, meters, arrays, idxs, t_b, n_b):
                batch = gather_batch(arrays, idxs, t_b, n_b, cfg.hop_size)
                new_state, metrics = train_step(state, batch)
                return new_state, jax.tree.map(jnp.add, meters, metrics)

            if single_dev:
                # single chip: plain jit — explicit-sharding executables take
                # a slower dispatch path on the tunneled backend
                step_store_fn = jax.jit(step_store, static_argnums=(4, 5),
                                        donate_argnums=(0, 1))
            else:
                step_store_fn = jax.jit(
                    step_store, static_argnums=(4, 5),
                    in_shardings=(repl, repl, repl, idx_sharding),
                    out_shardings=(repl, repl), donate_argnums=(0, 1))

        # Validation tracks the generator RECONSTRUCTION losses only
        # (reference validation_step, tasks/visinger.py:187-199 — no adv/fm).
        # Two modes:
        #   deterministic_eval: true  — dedicated program (dropout off, fixed
        #       sample/slice RNG); one extra compile.
        #   deterministic_eval: false — reuse the train program on a device-
        #       side copy of the state (donation consumes the copy) and sum
        #       the recon metric subset; zero extra compiles (a fresh compile
        #       is minutes through the TPU tunnel).
        copy_state = jax.jit(lambda s: jax.tree.map(jnp.copy, s))
        det_eval = bool(cfg.get("deterministic_eval", False))
        if det_eval:
            eval_step = make_eval_step(cfg, self.model)
            eval_step_fn = jax.jit(eval_step)
            if use_store:
                def eval_store(params_g, arrays, idxs, t_b, n_b, rng):
                    batch = gather_batch(arrays, idxs, t_b, n_b, cfg.hop_size)
                    return eval_step(params_g, batch, rng)

                eval_store_fn = jax.jit(eval_store, static_argnums=(3, 4))

        def eval_loss(state, max_batches) -> float:
            totals = []
            key = jax.random.PRNGKey(0)  # fixed: comparable across evals
            if use_store:
                for idxs, t_b, n_b in valid_store.plan_batches(shuffle=False):
                    if len(totals) >= max_batches:
                        break
                    if det_eval:
                        m = eval_store_fn(state.params_g, valid_store.arrays,
                                          put_idx(idxs), t_b, n_b, key)
                        totals.append(float(jax.device_get(m["total_g"])))
                    else:
                        _, m = step_store_fn(copy_state(state),
                                             jax.device_put(zero_meters()),
                                             valid_store.arrays,
                                             put_idx(idxs), t_b, n_b)
                        totals.append(recon_loss_total(jax.device_get(m)))
            else:
                for i, batch in enumerate(valid_ds.batches(
                        max_sentences=cfg.max_sentences, shuffle=False)):
                    if i >= max_batches:
                        break
                    if det_eval:
                        m = eval_step_fn(state.params_g,
                                         self._put_batch(batch), key)
                        totals.append(float(jax.device_get(m["total_g"])))
                    else:
                        _, m = step_fn(copy_state(state), zero_meters(),
                                       self._put_batch(batch))
                        totals.append(recon_loss_total(jax.device_get(m)))
            return float(np.mean(totals)) if totals else float("nan")

        n_sanity = int(cfg.get("num_sanity_val_steps", 0))
        if n_sanity > 0 and not start_step:
            # crash-early validation pass before training (reference
            # trainer.py:260-262); reuses the compiled train program
            sanity = eval_loss(state, n_sanity)
            if jax.process_index() == 0:
                print(f"| sanity val ({n_sanity} batches): {sanity:.3f}")

        meters = jax.device_put(zero_meters())
        meters_n = 0
        step = start_step
        # max_updates / val_check_interval / tb_log_interval count OPTIMIZER
        # steps (the reference's global_step advances once per optimizer step,
        # trainer.py:339,368); `step` counts micro-batches, so every schedule
        # below compares step // accum.  accum == 1 reduces to step itself.
        accum = max(int(cfg.get("accumulate_grad_batches", 1)), 1)
        epoch = 0
        t_start = time.time()
        # jax.profiler trace window (SURVEY §5.1 rebuild note): set
        # profile_dir to capture steps [profile_start, profile_start+5)
        profile_dir = cfg.get("profile_dir", "")
        profile_start = int(cfg.get("profile_start_step", 10))
        from visinger_tpu.data.prefetch import prefetch

        while step < max_updates * accum:
            if use_store:
                # per-step host work: one [B] int32 index transfer + dispatch
                epoch_iter = (
                    (put_idx(idxs), t_b, n_b)
                    for idxs, t_b, n_b in train_store.plan_batches(
                        seed=cfg.seed + epoch))
            else:
                # decode + collate + host->device transfer on the prefetch
                # thread, overlapped with device compute
                def device_batches(ep):
                    for b in train_ds.batches(seed=cfg.seed + ep):
                        yield self._put_batch(b)

                epoch_iter = prefetch(device_batches(epoch))

            for item in epoch_iter:
                if profile_dir and step == profile_start:
                    jax.profiler.start_trace(profile_dir)
                if use_store:
                    idxs, t_b, n_b = item
                    state, meters = step_store_fn(
                        state, meters, train_store.arrays, idxs, t_b, n_b)
                else:
                    state, meters = step_fn(state, meters, item)
                step += 1
                meters_n += 1
                opt_step, opt_boundary = step // accum, step % accum == 0
                if profile_dir and step == profile_start + 5:
                    jax.block_until_ready(state)
                    jax.profiler.stop_trace()
                if (opt_boundary and opt_step % cfg.tb_log_interval == 0
                        and self.logger):
                    fetched = jax.device_get(meters)  # single transfer
                    avg = {k: float(v) / meters_n for k, v in fetched.items()}
                    avg["steps_per_s"] = cfg.tb_log_interval / max(
                        time.time() - t_start, 1e-9)
                    t_start = time.time()
                    self.logger.log(opt_step, avg)
                    print(f"| step {opt_step}: " + ", ".join(
                        f"{k}={v:.3f}" for k, v in sorted(avg.items())))
                    meters = jax.device_put(zero_meters())
                    meters_n = 0
                if opt_boundary and opt_step % cfg.val_check_interval == 0:
                    val_loss = eval_loss(state, cfg.eval_max_batches)
                    if self.logger:
                        self.logger.log(opt_step, {"val_loss": val_loss},
                                        "val")
                    save_ckpt(state, val_loss=val_loss)
                    if (cfg.get("render_valid", False)
                            and opt_step % cfg.valid_infer_interval == 0
                            and jax.process_index() == 0):
                        self.render_valid(state, valid_ds, opt_step)
                if step >= max_updates * accum:
                    break
            epoch += 1
        save_ckpt(state)
        if ckpt_async is not None:
            ckpt_async.wait()  # final write durable before fit() returns
        return state

    # ------------------------------------------------------------------
    def render_valid(self, state, valid_ds, step: int,
                     n_items: int | None = None):
        """Synthesize a few validation items and dump wav + mel PNG to the
        work dir (reference save_valid_result, tasks/visinger.py:175-185)."""
        from visinger_tpu.ops.stft import STFTParams, log_mel_spectrogram
        from visinger_tpu.utils.audio.io import save_wav
        from visinger_tpu.utils.plot import save_spec_png

        cfg = self.cfg
        if n_items is None:  # explicit 0 = build _render_fn only (test())
            n_items = int(cfg.get("num_valid_plots", 2))
        from visinger_tpu.utils.audio.pitch import denorm_f0

        if self._render_fn is None:
            def infer_fn(params_g, batch, rng):
                out = self.model.apply(
                    {"params": params_g},
                    text_tokens=batch["text_tokens"],
                    pitch_tokens=batch["note_pitch"],
                    dur_tokens=batch["note_dur"],
                    mel2ph=batch["mel2ph"],
                    spk_id=batch["spk_ids"],
                    spk_embed=batch.get("spk_embed"),
                    infer=True, deterministic=True, rngs={"sample": rng})
                return out["wav_out"], out.get("f0_pred")

            self._render_fn = jax.jit(infer_fn)
        if n_items <= 0:  # caller only wanted _render_fn built
            return
        out_dir = os.path.join(self.work_dir, f"valid_{step}")
        os.makedirs(out_dir, exist_ok=True)
        mel_params = STFTParams(cfg.fft_size, cfg.win_size, cfg.hop_size,
                                cfg.sample_rate, float(cfg.fmin),
                                float(cfg.fmax), cfg.num_mel_bins)
        done = 0
        for batch in valid_ds.batches(max_sentences=cfg.max_sentences,
                                      shuffle=False):
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            wavs, f0_pred = self._render_fn(
                state.params_g, jb, jax.random.PRNGKey(step))
            wavs = np.asarray(wavs)
            f0_pred = None if f0_pred is None else np.asarray(f0_pred)
            mels = np.asarray(log_mel_spectrogram(jnp.asarray(wavs), mel_params))
            gt_wavs = gt_mels = None
            # GT audio/mels feed only the TB media path — computing gt_mels
            # is a second log_mel program (a fresh minutes-long compile
            # through the TPU tunnel), so skip it unless TensorBoard is
            # actually attached (logger._tb: the logger object itself always
            # exists on process 0 even when torch/TB is unavailable)
            tb_on = self.logger is not None and self.logger._tb is not None
            if tb_on:
                gt_wavs = np.asarray(batch["wavs"], np.float32)
                if batch["wavs"].dtype == np.int16:
                    gt_wavs = gt_wavs / 32767.0
                gt_mels = np.asarray(log_mel_spectrogram(
                    jnp.asarray(gt_wavs), mel_params))
            for i in range(wavs.shape[0]):
                if done >= n_items:
                    return
                t = int(batch["mel_lengths"][i])
                wav = wavs[i, : t * cfg.hop_size]
                save_wav(wav, f"{out_dir}/item{done}.wav", cfg.sample_rate,
                         norm=True)
                # mel figure with f0 overlays + GT duration ticks (reference
                # plot_mel/spec_to_figure, tasks/base.py:249-271,
                # utils/plot/plot.py:14-48)
                f0s = {}
                if "f0" in batch and "uv" in batch:
                    f0s["f0_gt"] = denorm_f0(batch["f0"][i][:t],
                                             uv=batch["uv"][i][:t])
                if f0_pred is not None:
                    f0s["f0_pred"] = denorm_f0(
                        f0_pred[i, :t, 0], uv=(f0_pred[i, :t, 1] > 0))
                mel2ph = np.asarray(batch["mel2ph"][i][:t])
                duration_gt = np.bincount(mel2ph)[1:]  # frames per token
                vmin = cfg.get("mel_vmin", -7)
                vmax = cfg.get("mel_vmax", 12)
                save_spec_png(f"{out_dir}/item{done}_mel.png", mels[i, :t],
                              vmin=vmin, vmax=vmax, f0s=f0s or None,
                              dur_info={"duration_gt": duration_gt})
                # TB media (reference save_valid_result/plot_mel,
                # tasks/visinger.py:175-185): predicted audio each render,
                # GT audio once in the first render window, and a
                # pred-|-GT side-by-side mel figure with overlays.
                if tb_on:
                    sr = int(cfg.sample_rate)
                    peak = max(float(np.max(np.abs(wav))), 1e-6)
                    self.logger.add_audio(f"wav_val_{done}", wav / peak,
                                          step, sr)
                    if step <= int(cfg.valid_infer_interval):
                        self.logger.add_audio(
                            f"wav_gt_{done}",
                            gt_wavs[i, : t * cfg.hop_size], step, sr)
                    from visinger_tpu.utils.plot import spec_to_figure

                    side_by_side = np.concatenate(
                        [mels[i, :t], gt_mels[i, :t]], axis=-1)
                    self.logger.add_figure(
                        f"mel_val_{done}",
                        spec_to_figure(side_by_side, vmin=vmin, vmax=vmax,
                                       f0s=f0s or None,
                                       dur_info={"duration_gt": duration_gt}),
                        step)
                done += 1
            if done >= n_items:
                return

    def _snapshot_code(self):
        """Copy the package source into the work dir for reproducibility
        (reference save_codes, trainer.py:565-581)."""
        import shutil

        import visinger_tpu

        src = os.path.dirname(visinger_tpu.__file__)
        dst = os.path.join(self.work_dir, "codes", "visinger_tpu")
        if not os.path.exists(dst):
            shutil.copytree(src, dst,
                            ignore=shutil.ignore_patterns("__pycache__"))

    def validate(self, state, max_batches: int | None = None) -> dict:
        """Standalone validation (reference ``--validate`` flag,
        hparams.py:35 + trainer.py:113-115): deterministic eval of the
        generator reconstruction losses over the valid split."""
        from visinger_tpu.training.train_step import make_eval_step

        cfg = self.cfg
        valid_ds = build_dataset(cfg, cfg.valid_set_name)
        eval_fn = jax.jit(make_eval_step(cfg, self.model))
        key = jax.random.PRNGKey(0)
        sums: dict = {}
        n = 0
        for i, batch in enumerate(valid_ds.batches(
                max_sentences=cfg.max_sentences, shuffle=False)):
            if max_batches and i >= max_batches:
                break
            m = jax.device_get(eval_fn(state.params_g,
                                       self._put_batch(batch), key))
            for k, v in m.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        means = {k: v / max(n, 1) for k, v in sums.items()}
        if jax.process_index() == 0:
            print(f"| validate ({n} batches): " + ", ".join(
                f"{k}={v:.4f}" for k, v in sorted(means.items())))
        return means

    def test(self, state, out_dir: str | None = None) -> list[dict]:
        """Synthesize the test split and measure RTF per item (reference
        VISingerTask.test_step, tasks/visinger.py:244-263)."""
        import json as _json

        from visinger_tpu.ops.stft import STFTParams
        from visinger_tpu.utils.audio.io import save_wav
        from visinger_tpu.utils.audio.quality import f0_metrics, mcd, mel_l1_np

        cfg = self.cfg
        mel_params = STFTParams(cfg.fft_size, cfg.win_size, cfg.hop_size,
                                cfg.sample_rate, float(cfg.fmin),
                                float(cfg.fmax), cfg.num_mel_bins)
        test_ds = build_dataset(cfg, cfg.test_set_name)
        out_dir = out_dir or os.path.join(
            self.work_dir, f"generated_{int(jax.device_get(state.step))}")
        os.makedirs(os.path.join(out_dir, "wavs"), exist_ok=True)
        if self._render_fn is None:
            self.render_valid(state, test_ds, 0, n_items=0)  # builds _render_fn
        results = []
        # per_item_rtf: synthesize batch-of-1 so each item's RTF is a real
        # wall-clock measurement (the reference tests at batch size 1,
        # tasks/base.py:96; batched mode reports the batch-mean RTF for every
        # item and marks it as such).
        per_item = bool(cfg.get("per_item_rtf", False))
        bs = 1 if per_item else cfg.max_sentences
        for batch in test_ds.batches(max_sentences=bs, shuffle=False,
                                     pad_to_max_sentences=not per_item):
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            t0 = time.time()
            wavs, _ = self._render_fn(state.params_g, jb, jax.random.PRNGKey(0))
            # Honest execution barrier: read back ONE scalar that depends on
            # the full waveform.  block_until_ready resolves before execution
            # finishes on the tunnel backend, and the multi-MB waveform
            # readback itself (~1 MB/s over the tunnel) is transfer, not
            # synthesis — keep it outside the timed window (same pattern as
            # bench.py's RTF mode).
            float(jnp.sum(wavs))
            dt = time.time() - t0
            wavs = np.asarray(wavs)
            batch_audio_s = float(np.sum(
                batch["mel_lengths"] * batch.get(
                    "item_weights", np.ones(len(batch["mel_lengths"]))))) \
                * cfg.hop_size / cfg.sample_rate
            n_real = int(np.sum(batch.get(
                "item_weights", np.ones(wavs.shape[0]))))
            for i in range(n_real):
                t = int(batch["mel_lengths"][i])
                wav = wavs[i, : t * cfg.hop_size]
                fn = f"item_{len(results):04d}_synth.wav"
                save_wav(wav, os.path.join(out_dir, "wavs", fn),
                         cfg.sample_rate, norm=cfg.get("out_wav_norm", True))
                # objective quality vs ground truth (BASELINE.md quality bar;
                # the reference test loop records none — RTF only)
                gt = np.asarray(batch["wavs"][i][: t * cfg.hop_size])
                gt = gt.astype(np.float32) / (32767.0 if gt.dtype == np.int16
                                              else 1.0)
                f0m = f0_metrics(gt, wav, cfg.sample_rate, cfg.hop_size,
                                 float(cfg.get("f0_min", 50)),
                                 float(cfg.get("f0_max", 1250)))
                results.append({
                    "wav_fn_pred": fn,
                    "audio_s": t * cfg.hop_size / cfg.sample_rate,
                    "rtf": dt / max(batch_audio_s, 1e-9),
                    "rtf_kind": "per_item" if per_item else "batch_mean",
                    "mcd": round(mcd(gt, wav, mel_params), 3),
                    "mel_l1": round(mel_l1_np(gt, wav, mel_params), 4),
                    "f0_rmse_cents": round(f0m["f0_rmse_cents"], 1),
                    "vuv_error": round(f0m["vuv_error"], 4),
                })
        with open(os.path.join(out_dir, "results.json"), "w") as f:
            _json.dump(results, f, indent=1)
        if results:
            mean_rtf = float(np.mean([r["rtf"] for r in results]))
            mean_mcd = float(np.mean([r["mcd"] for r in results]))
            mean_l1 = float(np.mean([r["mel_l1"] for r in results]))
            mean_f0 = float(np.nanmean(
                [r["f0_rmse_cents"] for r in results]))
            mean_vuv = float(np.nanmean([r["vuv_error"] for r in results]))
            print(f"| test: {len(results)} items, mean RTF {mean_rtf:.3f}, "
                  f"MCD {mean_mcd:.2f} dB, mel-L1 {mean_l1:.3f}, "
                  f"f0-RMSE {mean_f0:.0f} cents, V/UV err {mean_vuv:.3f}")
        return results

