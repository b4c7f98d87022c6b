"""SNIPER-TPU inference / evaluation CLI.

Counterpart of the reference main_test.py + imdb_detection_wrapper /
imdb_proposal_extraction_wrapper (inference.py:439-609): multi-scale
detection over TEST.SCALES (AutoFocus chips when TEST.AUTO_FOCUS),
aggregation with per-scale valid ranges + soft-NMS, dataset evaluation;
or RPN proposal extraction mode (TEST.EXTRACT_PROPOSALS).

  python main_test.py --cfg configs/sniper_res101_e2e.yml
"""

from __future__ import annotations

import argparse
import os
import pickle

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Test a SNIPER-TPU detector")
    p.add_argument("--cfg", required=True)
    p.add_argument("--set", dest="overrides", nargs="*", default=[])
    return p.parse_args()


def build_test_dataset(cfg):
    name = cfg.dataset.dataset
    if name == "coco":
        from sniper_tpu.data.coco import COCODataset

        return COCODataset(
            str(cfg.dataset.test_image_set), cfg.dataset.root_path,
            cfg.dataset.dataset_path,
            # mask configs need gt_masks in the TEST roidb too (mask
            # visualization/diagnostics read them; the roidb cache is
            # keyed on this flag, data/coco.gt_roidb)
            load_mask=bool(cfg.TRAIN.WITH_MASK),
        )
    if name == "PascalVOC":
        from sniper_tpu.data.pascal_voc import PascalVOC

        return PascalVOC(
            str(cfg.dataset.test_image_set), cfg.dataset.root_path,
            cfg.dataset.dataset_path,
        )
    raise KeyError(f"unknown dataset {name!r}")


def make_forward(model, variables, num_devices: int = 1, pixel_means=None):
    """Jitted test-mode forward; ``num_devices > 1`` runs data-parallel
    inference over a 1-D device mesh — the batch splits along dim 0
    across chips with replicated params (XLA auto-partitions; the
    reference instead binds its test Module over a GPU list,
    inference.py:416-428). Per-scale TEST.BATCH_IMAGES must then be a
    multiple of the device count.

    Batches arrive as uint8 RGB canvases (TestChipIterator) and are
    mean-subtracted on device (device_normalize) — 4x fewer
    host->device bytes than shipping fp32."""
    import jax.numpy as jnp

    from sniper_tpu.infer.tester import device_normalize

    @jax.jit
    def fn(variables, data, im_info):
        if data.dtype == jnp.uint8:
            if pixel_means is None:
                raise ValueError(
                    "uint8 canvases but make_forward got no pixel_means "
                    "— pass cfg.network.PIXEL_MEANS"
                )
            data = device_normalize(data, im_info, pixel_means)
        return model.apply(variables, data, im_info, train=False)

    if num_devices <= 1:
        return lambda data, im_info: fn(variables, data, im_info)

    from sniper_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    mesh = make_mesh(num_devices)
    variables = replicate(mesh, variables)

    if getattr(model, "pool_kernel", "") == "fused":
        # a pallas_call has no sharding rule under the auto-partitioner,
        # which is why registry's POOL_KERNEL "auto" falls back to the
        # einsum pool for multi-device inference. An EXPLICIT
        # POOL_KERNEL=fused keeps the 1.3-2x Pallas pool here instead:
        # shard_map splits the batch over the mesh and runs the whole
        # single-device program (Pallas kernel included) per shard, with
        # replicated params. Parity vs single-device is tested on the
        # virtual CPU mesh (tests/test_multichip_infer.py).
        from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        axis = mesh.axis_names[0]

        @jax.jit
        def fn(variables, data, im_info):  # noqa: F811 — shard_map form
            def shard(v, d, i):
                if d.dtype == jnp.uint8:
                    if pixel_means is None:
                        raise ValueError(
                            "uint8 canvases but make_forward got no "
                            "pixel_means — pass cfg.network.PIXEL_MEANS"
                        )
                    d = device_normalize(d, i, pixel_means)
                out = dict(model.apply(v, d, i, train=False))
                # rois carry a batch-index column; make it GLOBAL (each
                # shard numbers its local images 0..b/n-1)
                off = jax.lax.axis_index(axis) * d.shape[0]
                out["rois"] = out["rois"].at[..., 0].add(
                    jnp.asarray(off, out["rois"].dtype))
                return out

            return shard_map(
                shard, mesh=mesh,
                in_specs=(P(), P(axis), P(axis)),
                out_specs=P(axis), check_rep=False,
            )(variables, data, im_info)

    def forward(data, im_info):
        if data.shape[0] % mesh.devices.size:
            raise ValueError(
                f"test batch {data.shape[0]} not divisible by "
                f"{mesh.devices.size} devices (set TEST.BATCH_IMAGES "
                "to a multiple of parallel.num_devices)"
            )
        sb = shard_batch(mesh, {"data": data, "im_info": im_info})
        return fn(variables, sb["data"], sb["im_info"])

    return forward


def _scale_post_nms(cfg, s, model):
    """Per-scale post-NMS roi count for test scale ``s``.

    TEST.N_PROPOSAL_PER_SCALE is a dead scalar in the reference configs
    (present in every yml at 300, never read by lib/); here a LIST value
    gives it real per-scale semantics: the coarse, small-canvas scales
    only keep large detections (TEST.VALID_RANGES filters the rest), so
    they don't need the full 300 rois/img — the proposal+ROI-head work
    is the canvas-independent floor that dominates small-canvas step
    time (ARCHITECTURE.md round-2/3 perf notes). A scalar (reference
    compat) keeps the global RPN_POST_NMS_TOP_N everywhere.
    """
    n = getattr(cfg.TEST, "N_PROPOSAL_PER_SCALE", None)
    if isinstance(n, (list, tuple)):
        if len(n) <= s:
            # falling back silently would give the COARSEST scale the
            # model's global (largest) count — the inverse of the
            # feature's finest->coarsest intent
            raise ValueError(
                f"TEST.N_PROPOSAL_PER_SCALE has {len(n)} entries but "
                f"scale index {s} was requested — list it once per "
                "TEST.SCALES entry (finest->coarsest)"
            )
        return int(n[s])
    # scalar/absent -> keep the model's global count (model may be None
    # on a full USE_CACHE hit, where no forward ever runs)
    return int(model.post_nms_top_n) if model is not None else 0


def _test_num_devices(cfg):
    # explicit opt-in for multi-chip inference (unlike training, where
    # -1 means "all devices"): per-scale batches must divide the device
    # count, so silently fanning out would break small-batch runs
    n = int(cfg.parallel.num_devices)
    return n if n > 1 else 1


def run_detection(cfg, model, variables, roidb, dataset, out_dir):
    from sniper_tpu.chips.autofocus import add_chips
    from sniper_tpu.data.test_loader import TestChipIterator, init_inference_crops
    from sniper_tpu.infer.tester import Tester

    init_inference_crops(roidb)
    with_masks = bool(getattr(model, "with_mask", False))
    ndev = _test_num_devices(cfg)

    # testers are built lazily per post-NMS count: a scale resumed from
    # its dets_scale{s}.pkl cache never pays make_forward (which on a
    # multi-device run replicates the full parameter set per device)
    testers: dict = {}

    def get_tester(post_nms):
        if post_nms not in testers:
            if model is None:
                # callers may pass model=None only when every scale is
                # expected to resume from its dets cache; reaching here
                # means a scale missed — fail with the real cause
                # instead of an opaque attribute error below
                raise RuntimeError(
                    "run_detection(model=None) hit an uncached scale — "
                    "a dets_scale*.pkl is missing or TEST.USE_CACHE is "
                    "off for it; pass a model to run the forward"
                )
            m = model
            if post_nms != model.post_nms_top_n:
                m = model.clone(post_nms_top_n=post_nms)
            testers[post_nms] = Tester(
                make_forward(m, variables, ndev,
                             pixel_means=cfg.network.PIXEL_MEANS),
                cfg, dataset.num_classes,
            )
        return testers[post_nms]

    n_scales = len(cfg.TEST.SCALES)
    scale_dets, scale_masks = [], []
    for s in range(n_scales):
        # per-scale post-NMS roi count (list-valued N_PROPOSAL_PER_SCALE)
        post_nms = _scale_post_nms(cfg, s, model)
        autofocus = bool(cfg.TEST.AUTO_FOCUS) and s < n_scales - 1
        do_pruning = (
            cfg.TEST.DO_PRUNING[s]
            if isinstance(cfg.TEST.DO_PRUNING, (list, tuple))
            else bool(cfg.TEST.DO_PRUNING)
        )
        use_cache = (
            cfg.TEST.USE_CACHE[s]
            if isinstance(cfg.TEST.USE_CACHE, (list, tuple))
            else bool(cfg.TEST.USE_CACHE)
        )
        cache_file = os.path.join(out_dir, f"dets_scale{s}.pkl")
        # per-scale detection cache: a killed multi-scale run resumes
        # from the scales already on disk (reference inference.py:507-515)
        if use_cache and os.path.exists(cache_file):
            with open(cache_file, "rb") as f:
                cached = pickle.load(f)
            all_boxes = cached["dets"]
            all_maps = cached.get("maps")
            if with_masks:
                scale_masks.append(cached.get("masks"))
            print(f"scale {s}: loaded from cache {cache_file}")
        else:
            tester_s = get_tester(post_nms)
            batches = TestChipIterator(
                roidb, cfg, s,
                cfg.TEST.BATCH_IMAGES[s]
                if isinstance(cfg.TEST.BATCH_IMAGES, (list, tuple))
                else cfg.TEST.BATCH_IMAGES,
            )
            out = tester_s.get_detections(
                iter(batches), roidb, do_pruning=do_pruning,
                autofocus=autofocus, with_masks=with_masks,
            )
            all_boxes, all_maps = out[0], out[1]
            if with_masks:
                scale_masks.append(out[2])
            print(f"scale {s}: done")
            # atomic: USE_CACHE treats existence as "scale done"
            tmp = f"{cache_file}.tmp.{os.getpid()}"
            with open(tmp, "wb") as f:
                pickle.dump(
                    {"dets": all_boxes, "maps": all_maps,
                     "masks": out[2] if with_masks else None},
                    f,
                )
            os.replace(tmp, cache_file)
        scale_dets.append(all_boxes)
        if autofocus:
            add_chips(roidb, all_maps, s, cfg)

    # aggregation is pure host-side NMS — it never calls forward_fn, so
    # a fully cache-resumed run gets a forward-less Tester for free
    tester = (next(iter(testers.values()))
              if testers else Tester(None, cfg, dataset.num_classes))
    if with_masks:
        final, final_masks = tester.aggregate(
            scale_dets, len(roidb), scale_cls_masks=scale_masks,
        )
        stats = dataset.evaluate_detections(final, roidb)
        if hasattr(dataset, "evaluate_segmentations"):
            segm_stats = dataset.evaluate_segmentations(final_masks, roidb)
            stats = {"bbox": stats, "segm": segm_stats}
        return stats
    final = tester.aggregate(scale_dets, len(roidb))
    return dataset.evaluate_detections(final, roidb)


def run_proposal_extraction(cfg, model, variables, roidb, dataset, out_dir):
    from sniper_tpu.data.test_loader import TestChipIterator, init_inference_crops
    from sniper_tpu.infer.tester import Tester

    init_inference_crops(roidb)
    forward = make_forward(model, variables, _test_num_devices(cfg),
                           pixel_means=cfg.network.PIXEL_MEANS)
    tester = Tester(forward, cfg, dataset.num_classes)
    agg_boxes = None
    for s in range(len(cfg.TEST.SCALES)):
        batches = TestChipIterator(
            roidb, cfg, s,
            cfg.TEST.BATCH_IMAGES[s]
            if isinstance(cfg.TEST.BATCH_IMAGES, (list, tuple))
            else cfg.TEST.BATCH_IMAGES,
        )
        boxes, scores = tester.extract_proposals(iter(batches), roidb)
        dets = [np.hstack([b, sc]) for b, sc in zip(boxes, scores)]
        agg_boxes = dets if agg_boxes is None else [
            np.vstack([a, d]) for a, d in zip(agg_boxes, dets)
        ]
    os.makedirs(cfg.TEST.PROPOSAL_SAVE_PATH, exist_ok=True)
    out = os.path.join(cfg.TEST.PROPOSAL_SAVE_PATH,
                       f"{dataset.name}_rpn.pkl")
    # atomic: resume logic (scripts/run_negchip_smoke_tpu.py) treats
    # bare existence as "phase 2 done", so a kill mid-write must not
    # leave a truncated pkl behind
    tmp = f"{out}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump({"boxes": agg_boxes}, f)
    os.replace(tmp, out)
    print(f"saved proposals to {out}")


def main():
    from sniper_tpu.config import load_config
    from sniper_tpu.config.defaults import config_name
    from sniper_tpu.models.registry import get_model
    from sniper_tpu.utils.logger import create_logger

    args = parse_args()
    cfg = load_config(args.cfg, args.overrides)
    name = config_name(args.cfg)
    logger, out_dir = create_logger(cfg.output_path or "./output", name,
                                    str(cfg.dataset.test_image_set))

    dataset = build_test_dataset(cfg)
    roidb = dataset.gt_roidb()

    model = get_model(cfg)
    from sniper_tpu.train.checkpoint import restore_inference_variables

    variables = restore_inference_variables(cfg, model, name, logger)

    if cfg.TEST.EXTRACT_PROPOSALS:
        run_proposal_extraction(cfg, model, variables, roidb, dataset, out_dir)
    else:
        stats = run_detection(cfg, model, variables, roidb, dataset, out_dir)
        logger.info(f"evaluation: {stats}")


if __name__ == "__main__":
    main()
