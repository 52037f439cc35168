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


def build_language(cfg):
    """Build the frozen language tower from cfg.language.

    kind selects the family: default EVA02CLIP (modeling/text/wrapper.py);
    "bert" / "t5" / "llama2" route to the HF wrappers
    (ape/modeling/text/{bert,t5,llama2}_wrapper.py counterparts) — e.g. the
    *_mdl_llama2 flagship configs."""
    from ape_tpu.modeling.text.wrapper import EVA02CLIP

    lang_cfg = dict(cfg.get("language", {}) or {})
    kind = lang_cfg.pop("kind", "eva02clip")
    if kind != "eva02clip":
        from ape_tpu.modeling.text.hf_wrappers import build_hf_text_model

        lang_cfg.pop("output_dim", None)
        return build_hf_text_model(kind, **lang_cfg)
    lang_cfg.setdefault("output_dim", int(cfg.train.get("text_dim", 1024)))
    return EVA02CLIP(**lang_cfg)


def build_text_fn(cfg, model_language=None):
    """Prompt-routing text features per batch (name/phrase/expression + bank).

    Reference: segm_vl.py:166-340. Without a language tower (training smoke /
    from-scratch runs), phrases embed via TextRouter's deterministic hash
    fallback.
    """
    from ape_tpu.engine.text_router import TextRouter

    groups = _train_groups(cfg)
    prompts = list(
        cfg.train.get("dataset_prompts", [])
        or [g.get("prompt", "name") for g in groups]
    )
    return TextRouter(
        model_language=model_language,
        num_text=int(cfg.train.get("num_text", 80)),
        text_dim=int(cfg.train.get("text_dim", 1024)),
        dataset_prompts=prompts,
        dataset_names=[list(g.get("dataset_names", [])) for g in groups],
        num_datasets=len(groups),
        seed=int(cfg.train.get("seed", 0)),
    )


def _train_groups(cfg):
    """Normalize cfg.dataloader.train into a list of group dicts.

    Mirrors the reference's list-of-dataloaders (flagship config :176-199):
    either ``dataloader.train.groups = [{dataset_names, batch_size, mapper,
    sampler}, ...]`` or the single-group form used by most eval configs.
    """
    dl = cfg.dataloader.train
    groups = dl.get("groups", None)
    if groups:
        return list(groups)
    return [dl]


def do_train(args, cfg):
    import functools

    import jax
    import jax.numpy as jnp

    from ape_tpu.config import instantiate
    from ape_tpu.checkpoint.checkpointer import Checkpointer, PeriodicCheckpointer
    from ape_tpu.engine.optimizer import build_optimizer, make_lr_schedule
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
    # resolve against a shared root. `criterions` (a list, one per dataset
    # group — reference flagship wires 10) takes precedence over `criterion`.
    crit_cfgs = cfg.get("criterions", None) or [cfg.criterion]
    objs = instantiate(ConfigDict(model=cfg.model, criterions=list(crit_cfgs)))
    model, criterions = objs["model"], list(objs["criterions"])

    img = int(train.get("image_size", 1024))
    num_text = int(train.get("num_text", 80))
    text_dim = int(train.get("text_dim", 1024))
    iter_size = int(train.get("iter_size", 1))

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
    lr_fn = make_lr_schedule(
        cfg.optimizer.get("base_lr", 2e-4),
        cfg.optimizer.get("milestones", []),
        cfg.optimizer.get("warmup_steps", 0),
    )
    # the data axis must divide every group's micro-batch; idle extras otherwise
    import math

    groups = _train_groups(cfg)
    micro_bs = [int(g.get("batch_size", 1)) for g in groups]
    # train.fsdp > 1 carves an fsdp axis out of the device pool (the
    # reference's train_net_fsdp.py / create_fsdp_model FULL_SHARD surface);
    # param_sharding shards big leaves over it, data rides the rest.
    fsdp = max(1, int(train.get("fsdp", 1)))
    avail = len(jax.devices())
    fsdp = math.gcd(fsdp, avail)
    n_dev = avail // fsdp
    for b in micro_bs:
        n_dev = math.gcd(b, n_dev)
    n_dev = n_dev or 1
    mesh = make_mesh(n_devices=n_dev * fsdp, fsdp=fsdp)
    if fsdp > 1:
        logger.info(f"FSDP enabled: mesh (data={n_dev}, fsdp={fsdp})")
    params = jax.device_put(params, param_sharding(mesh, params))
    state = create_train_state(params, tx, ema=train.get("ema_decay", 0) > 0)

    ckpt = Checkpointer(train.output_dir, keep=2)
    state, start_iter = ckpt.resume_or_load(
        state, train.get("init_checkpoint", ""), resume=args.resume
    )

    # data: one loader per group; each step picks a loader by ratio-weighted
    # choice (reference Trainer._data_loader_iter, tools/train_net.py:404-420).
    # Loaders emit batch_size * iter_size samples; the jitted step scans over
    # iter_size microbatches (grad accumulation).
    from ape_tpu.data.catalog import DatasetCatalog
    from ape_tpu.data.samplers import MultiDatasetSampler

    loaders, mds = [], None
    ratio = list(train.get("dataset_ratio", [1.0] * len(groups)))
    registered = all(
        n in DatasetCatalog for g in groups for n in g.get("dataset_names", [])
    ) and any(g.get("dataset_names", []) for g in groups)
    if registered:
        from ape_tpu.config import instantiate as inst
        from ape_tpu.data.build import build_detection_train_loader

        for i, g in enumerate(groups):
            loaders.append(
                build_detection_train_loader(
                    list(g["dataset_names"]),
                    inst(g["mapper"]),
                    int(g.get("batch_size", 1)) * iter_size,
                    g.get("sampler", "TrainingSampler"),
                    seed=int(train.get("seed", 0)) + i,
                    dataset_id=i,
                    filter_empty=bool(g.get("filter_empty", True)),
                    copypaste_prob=float(g.get("copypaste_prob", 0.0)),
                )
            )
    else:
        logger.warning("datasets unavailable; using synthetic fast_dev_run data")
        loaders = [
            synthetic_loader(
                int(g.get("batch_size", 1)) * iter_size, img, num_text, text_dim
            )
            for g in groups
        ]
    if len(loaders) > 1:
        mds = MultiDatasetSampler(ratio, seed=int(train.get("seed", 0)))

    dataset_prompts = list(train.get("dataset_prompts", []) or [])

    @functools.lru_cache(maxsize=None)
    def _step_fn_for(crit_idx: int, prompt: str):
        return jax.jit(
            make_train_step(
                model,
                criterions[crit_idx],
                tx,
                ema_decay=train.get("ema_decay", 0.0),
                iter_size=iter_size,
                prompt=prompt,
            ),
            donate_argnums=(0,),
        )

    def step_fn_for(ds_id: int):
        # groups sharing one (criterion, prompt-type) share one compiled step
        prompt = dataset_prompts[ds_id] if ds_id < len(dataset_prompts) else "name"
        return _step_fn_for(min(ds_id, len(criterions) - 1), prompt)

    eval_fn = None
    if train.get("eval_period", 0) and cfg.dataloader.get("tests", []):
        def eval_fn(st):
            return run_eval(cfg, model, st.ema_params if st.ema_params is not None else st.params)

    trainer = Trainer(
        step_fn_for(0),
        state,
        loaders,
        dataset_sampler=mds,
        text_fn=build_text_fn(cfg),
        max_iter=train.max_iter,
        log_period=train.get("log_period", 20),
        output_dir=train.output_dir,
        checkpointer=PeriodicCheckpointer(ckpt, train.get("checkpoint_period", 5000), train.max_iter),
        mesh=mesh,
        step_fn_by_dataset=step_fn_for,
        eval_fn=eval_fn,
        eval_period=int(train.get("eval_period", 0)),
        lr_fn=lr_fn,
        profile_dir=train.get("profile_dir", None),
        profile_start=int(train.get("profile_start", 10)),
        profile_iters=int(train.get("profile_iters", 5)),
    )
    trainer.train(start_iter)


def run_eval(cfg, model, params):
    """Evaluate `params` on every registered test dataset in the config.

    Shared by --eval-only (do_test) and the mid-training eval hook
    (reference EvalHook, tools/train_net.py:592-596).
    """
    from ape_tpu.config import instantiate
    from ape_tpu.data.catalog import DatasetCatalog
    from ape_tpu.engine.ape_wrapper import APE
    from ape_tpu.evaluation.eval_runner import evaluate_dataset
    from ape_tpu.evaluation.other_evals import aggregate_benchmark_suite

    tests = cfg.dataloader.get("tests", [])
    names = [t["dataset_name"] for t in tests if t["dataset_name"] in DatasetCatalog]
    if not names:
        logger.warning("no registered eval datasets; nothing to evaluate")
        return {}

    num_text = int(cfg.train.get("num_text", 80))
    lang = build_language(cfg)
    keep = [t for t in tests if t["dataset_name"] in names]
    prompts = [t.get("prompt", "name") for t in keep]
    # per-dataset eval protocol (reference dataloader.select_box_nums_for_
    # evaluation_list / name_prompt_fusion_text, consumed at set_eval_dataset
    # time — deformable_detr.py:195-196, segm_vl.py:342-360). The suite data
    # configs carry per-test tables; aligned here with the kept test order.
    box_list = cfg.dataloader.get("select_box_nums_for_evaluation_list", None)
    fusion_list = cfg.dataloader.get("name_prompt_fusion_text", None)
    if box_list is not None:
        box_list = [int(v) for t, v in zip(tests, box_list) if t["dataset_name"] in names]
    if fusion_list is not None:
        fusion_list = [
            bool(v) for t, v in zip(tests, fusion_list) if t["dataset_name"] in names
        ]
    ape = APE(
        model, params, lang, dataset_names=names, dataset_prompts=prompts,
        max_text=num_text,
        select_box_nums_for_evaluation=int(
            cfg.train.get("select_box_nums_for_evaluation", 300)
        ),
        select_box_nums_for_evaluation_list=box_list,
        name_prompt_fusion_text=fusion_list,
        name_prompt_fusion_type=cfg.train.get("name_prompt_fusion_type", "zero"),
    )

    results = {}
    for t in tests:
        name = t["dataset_name"]
        if name not in DatasetCatalog:
            logger.warning(f"dataset {name} not registered; skipping")
            continue
        mapper = instantiate(t["mapper"]) if t.get("mapper") is not None else None
        iou_types = tuple(
            t.get("iou_types")
            or (("bbox", "segm") if cfg.model.get("mask_on", True) else ("bbox",))
        )
        results[name] = evaluate_dataset(
            ape, name, mapper, iou_types,
            max_dets=int(t.get("max_dets", 100)),
            evaluator_type=t.get("evaluator_type"),
        )
        logger.info(f"{name}: {results[name]}")
    results.update(aggregate_benchmark_suite(results))
    return results


def do_test(args, cfg):
    import jax
    import jax.numpy as jnp

    from ape_tpu.config import ConfigDict, instantiate

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
    else:
        logger.warning(
            "eval-only with NO init_checkpoint: model AND text tower are "
            "random-init — metrics are smoke-test noise, not a real evaluation"
        )
    return run_eval(cfg, model, params)


def main():
    from ape_tpu.config import LazyConfig
    from ape_tpu.engine.defaults import default_argument_parser

    if os.environ.get("APE_PLATFORM"):
        from ape_tpu.utils.platform import force_platform

        force_platform(
            os.environ["APE_PLATFORM"], int(os.environ.get("APE_NUM_DEVICES", "1"))
        )
    from ape_tpu.parallel.mesh import initialize_distributed

    initialize_distributed()  # no-op unless JAX_NUM_PROCESSES/coordinator set

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
