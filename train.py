"""Training launcher — TPU-native replacement for reference train_ddp_spawn.py.

Usage (reference CLI surface, train_ddp_spawn.py:155-164):
    python train.py --base configs/train-v01.yaml --train True \
        [--resume logs/<run>] [--logdir logs] [--seed 23] \
        [--scale_lr True] [key.sub=value ...]

Distributed: single-controller JAX. On multi-host TPU slices run the same
command on every host (jax.distributed auto-initializes under TPU runtime);
the mesh spans all chips, gradients ride ICI via XLA collectives, and the
optimizer state is ZeRO-sharded along the data axis.
"""

from __future__ import annotations

import argparse
import datetime
import glob
import os
import sys

import numpy as np


def str2bool(v: str) -> bool:
    return str(v).lower() in ("yes", "true", "t", "1")


def parse_args(argv=None):
    # flag surface mirrors reference train_ddp_spawn.py:40-135 (same short
    # aliases), so README training commands work verbatim
    p = argparse.ArgumentParser(description="Hi3D-TPU trainer")
    p.add_argument("-b", "--base", nargs="*",
                   default=["configs/train-v01.yaml"],
                   help="config yaml(s), merged left-to-right")
    p.add_argument("-t", "--train", type=str2bool, default=True)
    p.add_argument("--no-test", "--no_test", dest="no_test", type=str2bool,
                   default=False,
                   help="skip the post-train eval-set media dump "
                        "(reference trainer.test, train_ddp_spawn.py:448)")
    p.add_argument("-r", "--resume", type=str, default="",
                   help="logdir or checkpoint dir to resume from")
    p.add_argument("-l", "--logdir", type=str, default="logs")
    p.add_argument("-n", "--name", type=str, default="")
    p.add_argument("-f", "--postfix", type=str, default="",
                   help="post-postfix for the run name")
    p.add_argument("-s", "--seed", type=int, default=23)
    p.add_argument("-d", "--debug", type=str2bool, default=False,
                   help="post-mortem debugger on exception "
                        "(reference train_ddp_spawn.py:450-457)")
    p.add_argument("--scale_lr", type=str2bool, default=True)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("-p", "--project", "--projectname", dest="projectname",
                   type=str, default="hi3d_tpu")
    p.add_argument("--logger", type=str, default="",
                   choices=["", "tensorboard", "testtube", "wandb", "jsonl"],
                   help="metrics backend (default: config `lightning.logger`"
                        " or tensorboard; jsonl = no event files)")
    p.add_argument("-o", "--outckpt", type=str, default="",
                   help="export the final weights as a reference-layout "
                        "safetensors (train_ddp_spawn.py:441-443 parity)")
    return p.parse_known_args(argv)


def resolve_data_batch(data_cfg: dict, local_device_count: int):
    """Reference DDP semantics: data.params.batch_size is PER-DEVICE
    (train-v01.yaml:9 — each rank loads its own batch). The
    single-controller loader must yield the whole local batch, so the
    instantiated config gets batch_size × local devices while LR scaling
    stays in per-device units. Returns (scaled_cfg, per_device_bs)."""
    per_device_bs = int(data_cfg.get("params", {}).get("batch_size", 1))
    data_cfg = dict(data_cfg)
    data_cfg["params"] = dict(data_cfg.get("params", {}))
    data_cfg["params"]["batch_size"] = per_device_bs * local_device_count
    return data_cfg, per_device_bs


def maybe_init_distributed() -> None:
    """Multi-host: initialize the JAX distributed runtime when a coordinator
    is configured (reference analog: PL/NCCL rank env wiring,
    train_ddp_spawn.py:159-162). No-op for single-host runs."""
    import jax

    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()


def main(argv=None) -> None:
    import jax

    from hi3d_tpu.config import apply_dotlist, instantiate_from_config, load_config
    from hi3d_tpu.training.trainer import Trainer
    from hi3d_tpu.utils.misc import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()
    maybe_init_distributed()
    args, unknown = parse_args(argv)
    overrides = [u for u in unknown if "=" in u]

    if args.debug:
        # post-mortem on crash (reference train_ddp_spawn.py:450-457, pudb)
        def _post_mortem(tp, value, tb):
            import pdb
            import traceback

            traceback.print_exception(tp, value, tb)
            pdb.post_mortem(tb)

        sys.excepthook = _post_mortem

    cfg = load_config(args.base)
    if overrides:
        cfg = apply_dotlist(cfg, overrides)

    if args.resume:
        logdir = args.resume.rstrip("/")
        if logdir.endswith("checkpoints"):
            logdir = os.path.dirname(logdir)
    else:
        now = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
        name = args.name or os.path.splitext(os.path.basename(args.base[0]))[0]
        logdir = os.path.join(args.logdir, f"{now}_{name}{args.postfix}")
    os.makedirs(logdir, exist_ok=True)

    if jax.process_index() == 0:
        # config snapshot (reference SetupCallback, vtdm/callbacks.py:22-67)
        import yaml

        with open(os.path.join(logdir, "config.yaml"), "w") as f:
            yaml.safe_dump(cfg, f, sort_keys=False)

    np.random.seed(args.seed + jax.process_index())

    model = instantiate_from_config(cfg["model"])
    model.base_learning_rate = cfg["model"].get("base_learning_rate", 1e-5)

    data_cfg = cfg.get("data")
    if data_cfg is None:
        raise ValueError("config needs a `data:` section")
    data_cfg, per_device_bs = resolve_data_batch(
        data_cfg, jax.local_device_count()
    )
    data = instantiate_from_config(data_cfg)
    data.setup()

    lightning_cfg = cfg.get("lightning", {})
    trainer_cfg = lightning_cfg.get("trainer", {})
    ckpt_cfg = (
        lightning_cfg.get("modelcheckpoint", {}).get("params", {})
    )

    sample_hw = (data.height, data.width)
    model.init(
        latent_hw=(sample_hw[0] // 8, sample_hw[1] // 8),
        num_frames=2,
        image_hw=(64, 64),
    )
    ckpt_path = cfg["model"]["params"].get("ckpt_path")
    if ckpt_path and os.path.exists(ckpt_path):
        model.init_from_ckpt(ckpt_path)

    img_cb = (
        lightning_cfg.get("callbacks", {})
        .get("image_logger", {})
        .get("params", {})
    )
    trainer = Trainer(
        model,
        logdir=logdir,
        scale_lr=args.scale_lr,
        accumulate_grad_batches=trainer_cfg.get("accumulate_grad_batches", 1),
        batch_size=per_device_bs,
        ckpt_every_n_steps=ckpt_cfg.get("every_n_train_steps", 3000),
        log_images_every=img_cb.get("batch_frequency", 200),
        max_to_keep=ckpt_cfg.get("save_top_k", 10),
        # ModelCheckpoint monitors model.monitor when set
        # (reference train_ddp_spawn.py:293-295)
        monitor=ckpt_cfg.get("monitor"),
        monitor_mode=ckpt_cfg.get("mode", "min"),
        seed=args.seed,
        # reference logger choice (train_ddp_spawn.py:256-280): --logger
        # wins, else `lightning.logger` from the config, else TensorBoard
        logger_backend=(
            args.logger or lightning_cfg.get("logger", "tensorboard")
        ),
    )

    max_steps = args.max_steps or trainer_cfg.get("max_steps", 100000)
    if args.train:
        state = trainer.fit(data.train_dataloader(), max_steps=max_steps,
                            resume=bool(args.resume))
        model.params = state.params
        model.ema_params = state.ema_params

    if not args.no_test and jax.process_index() == 0:
        # post-train "test": media dump on the first eval batch (reference
        # trainer.test after fit, train_ddp_spawn.py:448-449; the eval set is
        # SyncDreamerEvalData, sgm/data/video_dataset.py:142-163)
        from hi3d_tpu.training.trainer import ImageLogger

        try:
            val = data.val_dataloader()
            batch = next(iter(val)) if val is not None else None
        except Exception as e:
            print(f"[train] no eval set for the test pass ({e})")
            batch = None
        if batch is not None:
            ImageLogger(
                os.path.join(logdir, "test"), every_n_steps=1
            ).maybe_log(model, batch, step=0)

    if args.outckpt and jax.process_index() == 0:
        from hi3d_tpu.convert.jax_to_torch import (
            export_engine_state_dict,
            save_safetensors,
        )

        save_safetensors(export_engine_state_dict(model), args.outckpt)
        print(f"[train] exported {args.outckpt}")


if __name__ == "__main__":
    main()
