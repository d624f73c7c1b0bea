"""Encoder fine-tuning CLI: contrastive training on a mined tsv.

Closes the mining loop the reference leaves open: the pipeline's final
``align.rm_overlap.sort.tsv.gz`` rows are paired speech clips; this stage
fine-tunes the speech encoder on them with a symmetric InfoNCE objective
(models/training.py), sharded dp x tp over the device mesh, with
orbax checkpointing for resume.

CLI: ``python -m svecalign_tpu.train TSV OUT_DIR [--steps N]
[--batch_size B] [--lr 1e-4] [--init_ckpt W.npz] [--model_parallel 1]
[--max_seconds 10] [--min_score 1.05] [--save_every 100] [--seed 0]``
"""

import argparse
from pathlib import Path

import numpy as np

from svecalign_tpu.utils.jax_setup import setup_jax

setup_jax()

import svecalign_tpu.utils.file_utils as file_utils
from svecalign_tpu.utils.audio_utils import SAMPLE_RATE, load_waveform
from svecalign_tpu.utils.log_utils import logging

logger = logging.getLogger(__name__)


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("tsv", type=str,
                        help="mined tsv: score \\t src_path start end 16 \\t tgt_path start end 16")
    parser.add_argument("out_dir", type=str, help="checkpoint/output dir.")
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--temperature", type=float, default=0.05)
    parser.add_argument("--init_ckpt", type=str, default=None,
                        help=".npz encoder weights to start from.")
    parser.add_argument("--model_parallel", type=int, default=1,
                        help="tensor-parallel degree (mesh 'model' axis).")
    parser.add_argument("--max_seconds", type=float, default=10.0,
                        help="clips are cropped/padded to this duration.")
    parser.add_argument("--min_score", type=float, default=0.0,
                        help="only train on rows with margin score >= this.")
    parser.add_argument("--save_every", type=int, default=100)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--encoder_layers", type=int, default=24)
    parser.add_argument("--encoder_dim", type=int, default=1024)
    return parser.parse_args()


def load_rows(tsv_path: str, min_score: float):
    rows = []
    with file_utils.open(tsv_path) as fp:
        for line in fp:
            score_s, src_f, tgt_f = line.rstrip("\n").split("\t")
            if float(score_s) < min_score:
                continue
            sp, ss, se, _ = src_f.rsplit(" ", 3)
            tp, ts, te, _ = tgt_f.rsplit(" ", 3)
            rows.append(((sp, int(ss), int(se)), (tp, int(ts), int(te))))
    return rows


class ClipBatcher:
    """Random mined-pair batches; caches decoded waveforms per audio file."""

    def __init__(self, rows, batch_size: int, n_samples: int, seed: int):
        assert len(rows) >= 2, "need at least 2 mined pairs to train"
        self.rows = rows
        self.batch_size = batch_size
        self.n_samples = n_samples
        self.rng = np.random.default_rng(seed)
        self._wave_cache = {}

    def _wave(self, path: str) -> np.ndarray:
        if path not in self._wave_cache:
            w = load_waveform(path, sr=SAMPLE_RATE)
            self._wave_cache[path] = w if w.ndim == 1 else w[:, 0]
        return self._wave_cache[path]

    def _clip(self, spec) -> np.ndarray:
        path, start, end = spec
        wav = self._wave(path)[start:end][: self.n_samples]
        out = np.zeros(self.n_samples, dtype=np.float32)
        out[: len(wav)] = wav
        return out, min(end - start, self.n_samples)

    def next_batch(self):
        idx = self.rng.choice(len(self.rows), size=self.batch_size, replace=False)
        src = np.stack([self._clip(self.rows[i][0])[0] for i in idx])
        tgt = np.stack([self._clip(self.rows[i][1])[0] for i in idx])
        src_len = np.array([self._clip(self.rows[i][0])[1] for i in idx], np.int32)
        tgt_len = np.array([self._clip(self.rows[i][1])[1] for i in idx], np.int32)
        return dict(src_wav=src, src_len=src_len, tgt_wav=tgt, tgt_len=tgt_len)


def main():
    args = parse_args()
    logger.info(args)

    import jax
    import jax.numpy as jnp

    from svecalign_tpu.models.laser_encoder import LaserEncoderConfig
    from svecalign_tpu.models.param_utils import load_params_npz, save_params_npz
    from svecalign_tpu.models.training import (
        TrainConfig,
        make_train_state,
        shard_train_step,
    )
    from svecalign_tpu.parallel.mesh import make_mesh

    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    rows = load_rows(args.tsv, args.min_score)
    logger.info(f"{len(rows)} mined pairs available for training")
    n_samples = int(args.max_seconds * SAMPLE_RATE)
    batcher = ClipBatcher(rows, args.batch_size, n_samples, args.seed)

    config = LaserEncoderConfig(
        encoder_layers=args.encoder_layers, encoder_dim=args.encoder_dim
    )
    tcfg = TrainConfig(learning_rate=args.lr, temperature=args.temperature)
    model, params, opt, opt_state = make_train_state(
        config, tcfg, seed=args.seed, example_len=n_samples
    )
    if args.init_ckpt:
        params = load_params_npz(args.init_ckpt)
        opt_state = opt.init(params)
        logger.info(f"initialized from {args.init_ckpt}")

    mesh = make_mesh(model_parallel=args.model_parallel)
    logger.info(f"mesh: {dict(mesh.shape)}")
    step_fn, params, opt_state = shard_train_step(
        model, opt, tcfg, mesh, params, opt_state
    )

    # orbax checkpointing for resume (falls back to npz on any failure)
    try:
        import orbax.checkpoint as ocp

        mngr = ocp.CheckpointManager(out_dir.resolve() / "ckpt")
        latest = mngr.latest_step()
        if latest is not None:
            restored = mngr.restore(latest, args=ocp.args.StandardRestore(params))
            params = jax.device_put(restored, jax.tree.map(lambda x: x.sharding, params))
            logger.info(f"resumed from checkpoint step {latest}")
        start_step = latest or 0
    except Exception as e:  # pragma: no cover
        logger.warning(f"orbax unavailable ({e}); npz-only checkpoints")
        mngr = None
        start_step = 0

    for step in range(start_step, args.steps):
        batch = {k: jnp.asarray(v) for k, v in batcher.next_batch().items()}
        params, opt_state, loss = step_fn(params, opt_state, batch)
        if step % 10 == 0 or step == args.steps - 1:
            logger.info(f"step {step}: loss {float(loss):.4f}")
        if mngr is not None and (step + 1) % args.save_every == 0:
            import orbax.checkpoint as ocp

            mngr.save(step + 1, args=ocp.args.StandardSave(params))

    if mngr is not None:
        mngr.wait_until_finished()
    save_params_npz(jax.device_get(params), str(out_dir / "encoder_final.npz"))
    logger.info(f"saved final weights to {out_dir / 'encoder_final.npz'}")


if __name__ == "__main__":
    main()
