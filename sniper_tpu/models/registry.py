"""Model registry: reference symbol names -> detector constructors.

The reference instantiates symbols by name via ``eval(config.symbol)``
(main_train.py:83-84); here names map through an explicit registry so
reference configs drive the same model selection.
"""

from __future__ import annotations

import jax.numpy as jnp

from sniper_tpu.models.detector import SNIPERDetector


def _pool_kernel(cfg):
    """Resolve network.POOL_KERNEL for the inference pooling backend.

    "auto" -> the fused Pallas kernel (ops/pallas/fused_pool.py,
    1.3-2.0x faster than the einsum path on v5e) when running on a
    single TPU device; the einsum path on CPU or under explicit
    multi-device inference (parallel.num_devices > 1), where a
    pallas_call inside an auto-partitioned jit has no sharding rule.
    An EXPLICIT network.POOL_KERNEL=fused + num_devices > 1 instead
    selects main_test.make_forward's shard_map path, which runs the
    whole single-device program (Pallas pool included) per shard —
    parity-tested on the CPU mesh; auto stays conservative because the
    shard_map lowering is unprofiled on real multi-chip hardware.
    """
    pool = str(getattr(cfg.network, "POOL_KERNEL", "auto"))
    if pool != "auto":
        return pool
    n = int(getattr(cfg.parallel, "num_devices", 1) or 1)
    return default_pool_kernel(n)


def default_pool_kernel(num_devices: int = 1) -> str:
    """The backend "auto" resolves to: the fused Pallas kernel on a
    single TPU device, the einsum path everywhere else (CPU has no
    Mosaic; a pallas_call inside an auto-partitioned jit has no
    sharding rule). num_devices < 0 means "all devices" (training's
    convention), so a multi-chip host counts as multi. Benches and
    profile scripts import this so they measure the backend the
    framework would actually ship on that hardware."""
    import jax

    multi = (len(jax.devices()) if num_devices < 0 else num_devices) > 1
    on_tpu = jax.default_backend() in ("tpu", "axon")
    return "fused" if on_tpu and not multi else "einsum"


def _bn_mode(cfg):
    """Resolve network.BN_MODE -> (bn_mode, bn_groups).

    "local" = per-device BatchNorm statistics (the reference's training
    recipe, README.md:10): groups = the data-parallel device count, so
    each device's batch shard normalizes with its own moments and XLA
    never inserts a statistics collective. "sync" (default) keeps
    global-batch statistics. Single device -> plain sync either way.
    """
    mode = str(getattr(cfg.network, "BN_MODE", "sync"))
    if mode not in ("sync", "local"):
        raise ValueError(f"network.BN_MODE must be sync|local, got {mode!r}")
    if mode == "local":
        import jax

        n = int(getattr(cfg.parallel, "num_devices", 1) or 1)
        groups = len(jax.devices()) if n < 0 else n
        if groups > 1:
            return "local", groups
    return "sync", 1


def _resnet(units):
    def build(cfg, **overrides):
        bn_mode, bn_groups = _bn_mode(cfg)
        kw = dict(
            num_classes=cfg.dataset.NUM_CLASSES,
            num_anchors=cfg.network.NUM_ANCHORS,
            anchor_ratios=tuple(cfg.network.ANCHOR_RATIOS),
            anchor_scales=tuple(cfg.network.ANCHOR_SCALES),
            feat_stride=cfg.network.RPN_FEAT_STRIDE,
            units=units,
            autofocus=bool(cfg.TRAIN.AUTO_FOCUS or cfg.TEST.AUTO_FOCUS),
            with_mask=bool(cfg.TRAIN.WITH_MASK),
            rpn_only=bool(cfg.TRAIN.ONLY_PROPOSAL),
            dtype=jnp.bfloat16 if cfg.TRAIN.bf16 else jnp.float32,
            bbox_stds=tuple(cfg.TRAIN.BBOX_STDS),
            bbox_means=tuple(cfg.TRAIN.BBOX_MEANS),
            # inference-branch RPN knobs (reference MultiProposal attrs)
            pre_nms_top_n=int(cfg.TEST.RPN_PRE_NMS_TOP_N),
            post_nms_top_n=int(cfg.TEST.RPN_POST_NMS_TOP_N),
            nms_thresh=float(cfg.TEST.RPN_NMS_THRESH),
            rpn_min_size=float(cfg.TEST.RPN_MIN_SIZE),
            # train-branch knobs (reference MultiProposalTarget attrs);
            # the fused target op emits exactly RPN_POST_NMS_TOP_N rois
            train_pre_nms=int(cfg.TRAIN.RPN_PRE_NMS_TOP_N),
            train_post_nms=int(cfg.TRAIN.RPN_POST_NMS_TOP_N),
            train_nms_thresh=float(cfg.TRAIN.RPN_NMS_THRESH),
            train_min_size=float(cfg.TRAIN.RPN_MIN_SIZE),
            num_rois=int(cfg.TRAIN.RPN_POST_NMS_TOP_N),
            fg_fraction=float(cfg.TRAIN.FG_FRACTION),
            fg_thresh=float(cfg.TRAIN.FG_THRESH),
            bg_thresh_hi=float(cfg.TRAIN.BG_THRESH_HI),
            bg_thresh_lo=float(cfg.TRAIN.BG_THRESH_LO),
            head_margin_bins=int(
                getattr(cfg.network, "HEAD_MARGIN_BINS", 1)
            ),
            pool_kernel=_pool_kernel(cfg),
            bn_mode=bn_mode,
            bn_groups=bn_groups,
        )
        kw.update(overrides)
        return SNIPERDetector(**kw)

    return build


def _resnext(units):
    base = _resnet(units)

    def build(cfg, **overrides):
        overrides.setdefault("trunk_type", "resnext")
        overrides.setdefault("num_trunk_groups", 64)
        # grouped-3x3 formulation (models/resnext.py): supergroup
        # count for the block-diagonal expansion, A/B'd on the v5e by
        # scripts/profile_supergroups.py
        overrides.setdefault(
            "trunk_supergroups",
            int(getattr(cfg.network, "RESNEXT_SUPERGROUPS", 1)),
        )
        return base(cfg, **overrides)

    return build


def _mobilenetv2():
    base = _resnet(())

    def build(cfg, **overrides):
        overrides.setdefault("trunk_type", "mobilenetv2")
        overrides.setdefault("head_fc_dim", 512)
        # feat_stride comes from cfg.network.RPN_FEAT_STRIDE (32 in the
        # reference mobilenet config)
        return base(cfg, **overrides)

    return build


_REGISTRY = {
    "resnet_mx_101_e2e": _resnet((3, 4, 23, 3)),
    "resnet_mx_101_e2e_mask": _resnet((3, 4, 23, 3)),  # mask head enabled
    # via TRAIN.WITH_MASK in the mask ymls (detector.py with_mask branch)
    "resnet_mx_50_e2e": _resnet((3, 4, 6, 3)),
    "resnext_mx_101": _resnext((3, 4, 23, 3)),
    "mobilenetv2_e2e": _mobilenetv2(),
}


def list_models():
    return sorted(_REGISTRY)


def get_model(cfg, **overrides):
    name = cfg.symbol
    if name not in _REGISTRY:
        raise KeyError(f"unknown model symbol {name!r}; known: {list_models()}")
    return _REGISTRY[name](cfg, **overrides)
