"""Training CLI — `python -m bitswap_tpu.train --dataset mnist --nz 8`.

One entry point replaces the reference's four near-copy train scripts
(model/{mnist,cifar,imagenet,imagenetcrop}_train.py __main__ blocks,
mnist_train.py:830-1020).  The flow is the reference's: seed, build model,
warmup (data-dependent init on `warmup_batches` stacked batches), register
EMA, then epoch loop with eval every `eval_every` epochs, saving the best-
ELBO checkpoint.  Data parallelism is a device mesh instead of Horovod: the
batch shards over all local devices and XLA inserts the gradient psum
(SURVEY.md §2.2 "Distributed DP backend").  Multi-host runs call
`jax.distributed.initialize()` first (--multihost).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="bitswap_tpu.train",
        description="Train a hierarchical Bit-Swap VAE (TPU-native)",
    )
    # reference flags (mnist_train.py:832-848) with the same defaults
    p.add_argument("--dataset", default="mnist", help="mnist|cifar|imagenet|imagenetcrop")
    p.add_argument("--nz", type=int, default=None, help="stochastic layers (default: dataset's)")
    p.add_argument("--width", type=int, default=None, help="override reswidth")
    p.add_argument("--depth", type=int, default=8, help="total ResNet layers (resdepth)")
    p.add_argument("--kernel", type=int, default=3)
    p.add_argument("--nprocessing", type=int, default=4)
    p.add_argument("--batch", type=int, default=128, help="global batch size")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=2e-3)
    p.add_argument("--decay", type=float, default=0.9995)
    p.add_argument("--dropout", type=float, default=None)
    p.add_argument("--seed", type=int, default=99)
    p.add_argument("--eval-every", type=int, default=5, help="epochs between eval passes")
    p.add_argument("--warmup-batches", type=int, default=25)
    p.add_argument("--data-dir", default="data")
    p.add_argument("--synthetic-n", type=int, default=2048,
                   help="synthetic train-set size when no real data present")
    p.add_argument("--out-dir", default="runs")
    p.add_argument("--tag", default=None, help="run tag (default {dataset}_nz{nz})")
    p.add_argument("--no-dp", action="store_true", help="single-device (no mesh)")
    p.add_argument("--grad-compress", default="none",
                   choices=("none", "bfloat16", "float16"),
                   help="compressed gradient allreduce under DP (the "
                        "reference's Horovod fp16 compression parity)")
    p.add_argument("--multihost", action="store_true", help="jax.distributed.initialize()")
    p.add_argument("--no-tensorboard", action="store_true")
    p.add_argument("--max-steps", type=int, default=0, help="stop after N steps (0 = off)")
    p.add_argument("--resume", default=None, help="checkpoint path to resume from")
    return p


def main(argv=None) -> int:
    # stack dumps on demand (kill -USR1 <pid>) — long remote compiles on
    # tunneled backends are otherwise indistinguishable from hangs
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1)
    args = build_parser().parse_args(argv)
    if args.multihost:
        import jax

        jax.distributed.initialize()

    import jax
    import jax.numpy as jnp

    from bitswap_tpu.models import init_params, param_count
    from bitswap_tpu.models.sample import image_grid, reconstruct_images, sample_images
    from bitswap_tpu.parallel.mesh import data_mesh, make_dp_train_step
    from bitswap_tpu.train.data import batch_iterator, load_dataset
    from bitswap_tpu.train.runtime import (
        TrainConfig,
        init_train_state,
        load_checkpoint,
        make_eval_step,
        make_train_step,
        save_checkpoint,
        save_params,
        warmup,
    )
    from bitswap_tpu.utils.logging import MetricsLogger
    from bitswap_tpu.utils.profiling import PhaseTimer
    from bitswap_tpu.utils.registry import get_spec

    spec = get_spec(args.dataset)
    nz = args.nz or spec.default_nz
    cfg = spec.model_config(nz, dropout_p=args.dropout)
    if args.width:
        cfg = type(cfg)(**{**cfg.__dict__, "reswidth": args.width})
    if args.depth != 8 or args.kernel != 3 or args.nprocessing != 4:
        cfg = type(cfg)(**{**cfg.__dict__, "resdepth": args.depth,
                           "kernel_size": args.kernel, "nprocessing": args.nprocessing})
    tcfg = TrainConfig(
        lr=args.lr, lr_decay=args.decay, lr_decay_after=spec.lr_decay_after,
        warmup_batches=args.warmup_batches,
    )

    tag = args.tag or f"{args.dataset}_nz{nz}"
    outdir = os.path.join(args.out_dir, tag)
    log = MetricsLogger(outdir, tensorboard=not args.no_tensorboard)
    timer = PhaseTimer(sync=False)
    is_root = jax.process_index() == 0

    train_data, syn_train = load_dataset(args.dataset, "train", cfg.xs, args.data_dir,
                                         synthetic_n=args.synthetic_n)
    test_data, _ = load_dataset(args.dataset, "test", cfg.xs, args.data_dir)
    if is_root:
        print(f"model: {args.dataset} nz={nz} reswidth={cfg.reswidth} "
              f"({'synthetic' if syn_train else 'real'} data, {len(train_data)} train)")

    key = jax.random.PRNGKey(args.seed)
    # jit: one program instead of hundreds of tiny eager dispatches (slow on
    # remote-compile backends)
    params = jax.jit(lambda k: init_params(k, cfg))(key)
    if is_root:
        print(f"params: {param_count(params):,}")

    # warmup: data-dependent init (mnist_train.py:991)
    with timer.phase("warmup"):
        params = warmup(
            params, cfg, jax.random.PRNGKey(args.seed + 1),
            batch_iterator(train_data, min(args.batch, 64), key_seed=0),
            args.warmup_batches,
        )

    state = init_train_state(params, tcfg)
    if args.resume:
        state = load_checkpoint(args.resume, state)
        if is_root:
            print(f"resumed from {args.resume} at step {int(state.step)}")
    del params

    n_dev = len(jax.devices())
    if args.no_dp or n_dev == 1:
        step_fn = make_train_step(cfg, tcfg)
        prep_state = prep_batch = lambda x: x
    else:
        mesh = data_mesh(n_dev)
        step_fn, prep_state, prep_batch = make_dp_train_step(
            cfg, tcfg, mesh, grad_compress=args.grad_compress)
        if is_root:
            print(f"data-parallel over {n_dev} devices"
                  + ("" if args.grad_compress == "none"
                     else f" (grad allreduce in {args.grad_compress})"))
    state = prep_state(state)
    eval_fn = make_eval_step(cfg)

    best_elbo = float("inf")
    ckpt_dir = os.path.join("params", args.dataset)
    key = jax.random.PRNGKey(args.seed + 2)
    step = int(state.step)
    t_epoch = time.time()
    stop = False
    for epoch in range(args.epochs):
        if stop:
            break
        with timer.phase("train_epoch"):
            for batch in batch_iterator(train_data, args.batch, key_seed=epoch):
                key, k = jax.random.split(key)
                state, metrics = step_fn(state, k, prep_batch(jnp.asarray(batch)))
                step += 1
                if step % 50 == 0 and is_root:
                    m = {k_: float(v) for k_, v in metrics.items() if np.ndim(v) == 0}
                    # per-layer bits/dim (reference's x / z{i} tensorboard
                    # scalars, mnist_train.py:703-712) — stackplot input
                    m["bits/x"] = float(metrics["recon"])
                    for zi, kl in enumerate(np.asarray(metrics["kl_per_layer"])):
                        m[f"bits/z{zi + 1}"] = float(kl)
                    dt = time.time() - t_epoch
                    m["steps_per_sec"] = 50 / dt if step > 50 else 0.0
                    t_epoch = time.time()
                    log.scalars(step, m, prefix="train/")
                    print(f"epoch {epoch} step {step}: elbo {m['elbo']:.4f} b/d "
                          f"lr {m['lr']:.2e} ({m['steps_per_sec']:.1f} it/s)")
                if args.max_steps and step >= args.max_steps:
                    stop = True
                    break

        if (epoch + 1) % args.eval_every == 0 or epoch == args.epochs - 1 or stop:
            with timer.phase("eval"):
                elbos = []
                for batch in batch_iterator(test_data, min(args.batch, 128),
                                            key_seed=0, shuffle=False):
                    out = eval_fn(state.ema_params, jax.random.PRNGKey(epoch),
                                  jnp.asarray(batch))
                    elbos.append(float(out["elbo"]))
                test_elbo = float(np.mean(elbos)) if elbos else float("nan")
            if is_root:
                log.scalars(step, {"elbo": test_elbo}, prefix="test/")
                print(f"epoch {epoch}: test elbo {test_elbo:.4f} b/d (best {best_elbo:.4f})")
                # best-checkpoint save (mnist_train.py:805-813)
                if test_elbo < best_elbo:
                    best_elbo = test_elbo
                    save_checkpoint(os.path.join(ckpt_dir, f"nz{nz}_ckpt.msgpack"), state)
                    save_params(os.path.join(ckpt_dir, f"nz{nz}.msgpack"), state.ema_params)
                # sample / reconstruction grids (mnist_train.py:815-816)
                try:
                    samp = sample_images(state.ema_params, cfg, jax.random.PRNGKey(epoch), 16)
                    log.image_grid(step, "sample", image_grid(samp))
                    rec = reconstruct_images(state.ema_params, cfg,
                                             jax.random.PRNGKey(epoch), test_data[:16])
                    log.image_grid(step, "reconstruction", image_grid(rec))
                except Exception as e:  # grids are best-effort
                    print(f"grid render failed: {e}")

    if is_root:
        print(timer.dump(os.path.join(outdir, "phases.json")))
        print(f"best test elbo: {best_elbo:.4f} b/d; checkpoints in {ckpt_dir}/")
    log.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
