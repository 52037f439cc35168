#!/usr/bin/env python
"""Training/eval entry point.

Capability match: /root/reference/tools/train_net.py — LazyConfig load + dotted
CLI overrides, do_train (trainer with multi-loader choice, AMP->bf16, grad
accumulation, EMA, periodic checkpoint/eval) and do_test (per-benchmark
evaluators + suite aggregation), fast_dev_run smoke mode (:632-635), --eval-only
path. The multi-process `launch` is unnecessary: one process drives the whole
TPU mesh (jax.distributed covers multi-host).
"""

import logging
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

logger = logging.getLogger("ape_tpu")


def setup_logger(output_dir: str = ""):
    handlers = [logging.StreamHandler()]
    if output_dir:
        os.makedirs(output_dir, exist_ok=True)
        handlers.append(logging.FileHandler(os.path.join(output_dir, "log.txt")))
    logging.basicConfig(
        level=logging.INFO,
        format="[%(asctime)s %(name)s]: %(message)s",
        handlers=handlers,
    )


def synthetic_loader(batch_size, image_size, num_text, text_dim, max_gt=8, mask_size=None):
    """fast_dev_run data when no dataset is registered (smoke tests, CI)."""
    mask_size = mask_size or image_size // 4
    rng = np.random.RandomState(0)

    def gen():
        while True:
            n_valid = rng.randint(1, max_gt)
            boxes = np.zeros((batch_size, max_gt, 4), np.float32)
            boxes[:, :, :2] = rng.uniform(0.3, 0.7, (batch_size, max_gt, 2))
            boxes[:, :, 2:] = rng.uniform(0.1, 0.25, (batch_size, max_gt, 2))
            yield {
                "images": rng.randn(batch_size, image_size, image_size, 3).astype(np.float32),
                "image_sizes": np.asarray([[image_size, image_size]] * batch_size, np.int32),
                "targets": {
                    "labels": rng.randint(0, num_text, (batch_size, max_gt)).astype(np.int32),
                    "boxes": boxes,
                    "valid": (np.arange(max_gt)[None] < n_valid).repeat(batch_size, 0),
                    "masks": (rng.rand(batch_size, max_gt, mask_size, mask_size) > 0.8).astype(np.float32),
                },
            }

    class L:
        def __iter__(self):
            return gen()

    return L()


def build_text_fn(cfg, model_language=None):
    """Attach text features to each batch (vocabulary of the batch's dataset)."""
    import jax.numpy as jnp

    num_text = cfg.train.get("num_text", 80)
    text_dim = cfg.train.get("text_dim", 1024)

    if model_language is None:
        # fixed random bank (training from scratch without a language tower)
        rng = np.random.RandomState(0)
        bank = rng.randn(num_text, text_dim).astype(np.float32)

        def text_fn(batch):
            b = batch["images"].shape[0]
            batch["text_features"] = np.broadcast_to(bank[None], (b, num_text, text_dim)).copy()
            batch["text_valid"] = np.ones((b, num_text), bool)
            return batch

        return text_fn

    def text_fn(batch):
        names = batch.pop("vocabulary", None) or [f"class {i}" for i in range(num_text)]
        out = model_language.forward_text(list(names), cache=True)
        feats = np.asarray(out["last_hidden_state_eot"], np.float32)
        b = batch["images"].shape[0]
        padded = np.zeros((num_text, text_dim), np.float32)
        padded[: len(names)] = feats[:num_text]
        batch["text_features"] = np.broadcast_to(padded[None], (b, num_text, text_dim)).copy()
        valid = np.zeros((num_text,), bool)
        valid[: len(names)] = True
        batch["text_valid"] = np.broadcast_to(valid[None], (b, num_text)).copy()
        return batch

    return text_fn


def do_train(args, cfg):
    import jax
    import jax.numpy as jnp

    from ape_tpu.config import instantiate
    from ape_tpu.checkpoint.checkpointer import Checkpointer, PeriodicCheckpointer
    from ape_tpu.engine.optimizer import build_optimizer
    from ape_tpu.engine.train_step import create_train_state, make_train_step
    from ape_tpu.engine.trainer import Trainer
    from ape_tpu.parallel.mesh import make_mesh, param_sharding

    train = cfg.train
    if train.fast_dev_run.enabled:
        train.max_iter = 20
        train.eval_period = 10
        train.log_period = 1

    from ape_tpu.config import ConfigDict

    # instantiate together so absolute interpolations (e.g. "${model.num_queries}")
    # resolve against a shared root
    objs = instantiate(ConfigDict(model=cfg.model, criterion=cfg.criterion))
    model, criterion = objs["model"], objs["criterion"]

    img = int(train.get("image_size", 1024))
    num_text = int(train.get("num_text", 80))
    text_dim = int(train.get("text_dim", 1024))

    # init params with one example batch shape
    images = jnp.zeros((1, img, img, 3))
    params = model.init(
        jax.random.PRNGKey(train.get("seed", 0)),
        images,
        jnp.asarray([[img, img]], jnp.int32),
        jnp.zeros((1, num_text, text_dim)),
        jnp.ones((1, num_text), bool),
    )["params"]
    n_params = sum(x.size for x in jax.tree.leaves(params))
    logger.info(f"model parameters: {n_params / 1e6:.1f}M")

    tx = build_optimizer(params, **dict(cfg.optimizer))
    # the data axis must divide the global batch; idle extra devices in smoke runs
    import math

    bs = int(cfg.dataloader.train.get("batch_size", 1))
    n_dev = math.gcd(bs, len(jax.devices())) or 1
    mesh = make_mesh(n_devices=n_dev)
    params = jax.device_put(params, param_sharding(mesh, params))
    state = create_train_state(params, tx, ema=train.get("ema_decay", 0) > 0)

    ckpt = Checkpointer(train.output_dir, keep=2)
    state, start_iter = ckpt.resume_or_load(
        state, train.get("init_checkpoint", ""), resume=args.resume
    )

    # data
    loaders, mds = [], None
    dl = cfg.dataloader.train
    from ape_tpu.data.catalog import DatasetCatalog

    names = dl.get("dataset_names", [])
    have_data = all(n in DatasetCatalog for n in names) and names
    if have_data:
        from ape_tpu.config import instantiate as inst
        from ape_tpu.data.build import build_detection_train_loader

        loaders = [
            build_detection_train_loader(
                names, inst(dl.mapper), dl.batch_size, dl.get("sampler", "TrainingSampler")
            )
        ]
    else:
        logger.warning("datasets unavailable; using synthetic fast_dev_run data")
        loaders = [
            synthetic_loader(dl.get("batch_size", 1), img, num_text, text_dim)
        ]

    step_fn = jax.jit(
        make_train_step(
            model, criterion, tx,
            ema_decay=train.get("ema_decay", 0.0),
            iter_size=1,
        ),
        donate_argnums=(0,),
    )
    trainer = Trainer(
        step_fn,
        state,
        loaders,
        dataset_sampler=mds,
        text_fn=build_text_fn(cfg),
        max_iter=train.max_iter,
        log_period=train.get("log_period", 20),
        output_dir=train.output_dir,
        checkpointer=PeriodicCheckpointer(ckpt, train.get("checkpoint_period", 5000), train.max_iter),
        mesh=mesh,
    )
    trainer.train(start_iter)


def do_test(args, cfg):
    import jax
    import jax.numpy as jnp

    from ape_tpu.config import ConfigDict, instantiate
    from ape_tpu.data.catalog import DatasetCatalog
    from ape_tpu.engine.ape_wrapper import APE
    from ape_tpu.evaluation.eval_runner import evaluate_dataset
    from ape_tpu.evaluation.other_evals import aggregate_benchmark_suite
    from ape_tpu.modeling.text.wrapper import EVA02CLIP

    tests = cfg.dataloader.get("tests", [])
    names = [t["dataset_name"] for t in tests if t["dataset_name"] in DatasetCatalog]
    if not names:
        logger.warning("no registered eval datasets; nothing to evaluate")
        return {}

    model = instantiate(ConfigDict(model=cfg.model))["model"]
    img = int(cfg.train.get("image_size", 1024))
    num_text = int(cfg.train.get("num_text", 80))
    text_dim = int(cfg.train.get("text_dim", 1024))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, img, img, 3)),
        jnp.asarray([[img, img]], jnp.int32),
        jnp.zeros((1, num_text, text_dim)),
        jnp.ones((1, num_text), bool),
    )["params"]
    init = cfg.train.get("init_checkpoint", "")
    if init:
        from ape_tpu.checkpoint.convert import load_params_tolerant

        params = load_params_tolerant(init, params)
    lang = EVA02CLIP(**dict(cfg.get("language", {}) or {}))
    ape = APE(model, params, lang, dataset_names=names, max_text=num_text)

    results = {}
    for t in tests:
        name = t["dataset_name"]
        if name not in DatasetCatalog:
            logger.warning(f"dataset {name} not registered; skipping")
            continue
        mapper = instantiate(t["mapper"]) if t.get("mapper") is not None else None
        iou_types = ("bbox", "segm") if cfg.model.get("mask_on", True) else ("bbox",)
        results[name] = evaluate_dataset(ape, name, mapper, iou_types)
        logger.info(f"{name}: {results[name]}")
    results.update(aggregate_benchmark_suite(results))
    return results


def main():
    from ape_tpu.config import LazyConfig
    from ape_tpu.engine.defaults import default_argument_parser

    if os.environ.get("APE_PLATFORM"):
        from ape_tpu.utils.platform import force_platform

        force_platform(
            os.environ["APE_PLATFORM"], int(os.environ.get("APE_NUM_DEVICES", "1"))
        )

    args = default_argument_parser().parse_args()
    cfg = LazyConfig.load(args.config_file)
    LazyConfig.apply_overrides(cfg, [o for o in (args.opts or []) if "=" in o])
    setup_logger(cfg.train.get("output_dir", ""))
    if args.eval_only:
        do_test(args, cfg)
    else:
        do_train(args, cfg)


if __name__ == "__main__":
    main()
