"""SNIPER-TPU training CLI.

Counterpart of the reference main_train.py:36-146: config + roidb +
chip loader + model + optimizer + the epoch loop (here an explicit jitted
data-parallel step instead of mx.mod.Module.fit).

  python main_train.py --cfg configs/sniper_res101_e2e.yml \
      [--set TRAIN.lr 0.01 ...]
"""

from __future__ import annotations

import argparse

import jax
import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Train a SNIPER-TPU detector")
    p.add_argument("--cfg", required=True, help="experiment yaml")
    p.add_argument("--set", dest="overrides", nargs="*", default=[],
                   help="config overrides: key value ...")
    return p.parse_args()


def build_dataset(cfg):
    name = cfg.dataset.dataset
    if name == "coco":
        from sniper_tpu.data.coco import COCODataset

        sets = str(cfg.dataset.image_set).split("+")
        return [
            COCODataset(s, cfg.dataset.root_path, cfg.dataset.dataset_path,
                        load_mask=cfg.TRAIN.WITH_MASK)
            for s in sets
        ]
    if name == "PascalVOC":
        from sniper_tpu.data.pascal_voc import PascalVOC

        sets = str(cfg.dataset.image_set).split("+")
        return [
            PascalVOC(s, cfg.dataset.root_path, cfg.dataset.dataset_path)
            for s in sets
        ]
    raise KeyError(f"unknown dataset {name!r}")


def build_roidb(cfg, logger):
    import os

    from sniper_tpu.data.roidb import (
        append_flipped_images,
        filter_roidb,
        load_rpn_proposals,
    )

    roidb = []
    for ds in build_dataset(cfg):
        r = ds.gt_roidb()
        if cfg.TRAIN.USE_NEG_CHIPS:
            pkl = os.path.join(
                cfg.proposal_path,
                f"{ds.name}_rpn.pkl",
            )
            if os.path.exists(pkl):
                r = load_rpn_proposals(pkl, r, cfg.dataset.NUM_CLASSES)
            else:
                logger.info(
                    f"proposals {pkl} not found: neg-chip mining will only "
                    "see GT boxes"
                )
        roidb += r
    if cfg.TRAIN.FLIP:
        roidb = append_flipped_images(roidb)
    roidb = filter_roidb(roidb, cfg.TRAIN.FG_THRESH, cfg.TRAIN.BG_THRESH_HI,
                         cfg.TRAIN.BG_THRESH_LO)
    logger.info(f"roidb: {len(roidb)} images")

    # roidb-level regression-target statistics (reference
    # main_train.py:69, bbox_regression.py:56-113). Precomputed -> the
    # config constants pass through unchanged; otherwise the measured
    # class-agnostic fg means/stds replace them, so the in-graph target
    # normalization and the inference-time denorm both use them.
    from sniper_tpu.data.bbox_regression import add_bbox_regression_targets

    means, stds = add_bbox_regression_targets(roidb, cfg)
    if not cfg.TRAIN.BBOX_NORMALIZATION_PRECOMPUTED:
        # agnostic: row 1 is the shared fg row; else average the fg rows
        m = means.reshape(-1, 4)[1:].mean(axis=0)
        s = stds.reshape(-1, 4)[1:].mean(axis=0)
        if (s > 1e-3).all():
            cfg.TRAIN.BBOX_MEANS = tuple(float(v) for v in m)
            cfg.TRAIN.BBOX_STDS = tuple(float(v) for v in s)
            logger.info(
                f"empirical bbox means={cfg.TRAIN.BBOX_MEANS} "
                f"stds={cfg.TRAIN.BBOX_STDS}"
            )
        else:
            # degenerate statistics (e.g. GT-only roidb: every target is
            # exactly zero) would divide the in-graph normalization by ~0
            logger.info(
                f"empirical bbox stds degenerate ({s}); keeping config "
                f"constants {cfg.TRAIN.BBOX_STDS}"
            )
    return roidb


def main():
    import optax

    from sniper_tpu.config import load_config
    from sniper_tpu.config.defaults import config_name
    from sniper_tpu.data.loader import ChipLoader, Prefetcher
    from sniper_tpu.models.registry import get_model
    from sniper_tpu.parallel.mesh import make_mesh, shard_batch
    from sniper_tpu.train.checkpoint import save_checkpoint
    from sniper_tpu.train.metrics import MetricTracker
    from sniper_tpu.train.optimizer import make_optimizer
    from sniper_tpu.train.trainer import create_train_state, make_train_step
    from sniper_tpu.utils.logger import create_logger

    args = parse_args()
    cfg = load_config(args.cfg, args.overrides)
    name = config_name(args.cfg)
    logger, out_dir = create_logger(cfg.output_path or "./output", name,
                                    str(cfg.dataset.image_set))

    # multi-host DP: join the global mesh before the first device query
    from sniper_tpu.parallel.distributed import (
        maybe_init_distributed,
        shard_roidb,
    )

    pid, nprocs = maybe_init_distributed(cfg, logger)

    n_dev = len(jax.devices()) if cfg.parallel.num_devices < 0 else \
        cfg.parallel.num_devices
    mesh = make_mesh(n_dev)
    batch_size = cfg.TRAIN.BATCH_IMAGES * n_dev
    # each process loads/feeds only its slice of the global batch
    local_batch = batch_size // nprocs
    logger.info(f"devices={n_dev} global_batch={batch_size} "
                f"processes={nprocs} local_batch={local_batch}")

    roidb = shard_roidb(build_roidb(cfg, logger), pid, nprocs)
    if nprocs > 1:
        logger.info(f"process {pid}: {len(roidb)} roidb images")
    if bool(getattr(cfg.TRAIN, "LOADER_PROCESS", False)):
        # batch ASSEMBLY in a spawned process over shared memory: the
        # training interpreter does only relay framing + step dispatch
        # (data/shm_loader.py; A/B'd on this box by
        # scripts/profile_pipeline_process.py)
        from sniper_tpu.data.shm_loader import ProcessChipLoader

        loader = ProcessChipLoader(roidb, cfg, local_batch,
                                   seed=cfg.TRAIN.seed + pid)
    else:
        loader = ChipLoader(roidb, cfg, local_batch,
                            seed=cfg.TRAIN.seed + pid)

    # explicit POOL_KERNEL=fused is a single-device (or shard_map
    # inference) backend: inside the auto-partitioned TRAIN jit a
    # pallas_call has no sharding rule and fails at lowering on a >1
    # device mesh — demote to the einsum path like "auto" does
    if n_dev > 1 and str(cfg.network.POOL_KERNEL) == "fused":
        logger.info("network.POOL_KERNEL=fused is single-device-only for "
                    f"training (mesh has {n_dev} devices); using einsum")
        cfg.network.POOL_KERNEL = "einsum"
    model = get_model(cfg)
    n_chips = loader.reset()
    logger.info(f"epoch 0: {n_chips} chips")
    epoch_size = max(len(loader), 1)

    sample = (loader.sample_batch() if hasattr(loader, "sample_batch")
              else next(iter(loader)))
    state = create_train_state(model, cfg, sample, optax.sgd(0.1),
                               seed=cfg.TRAIN.seed)
    if str(cfg.network.pretrained or "").strip():
        from sniper_tpu.train.pretrained import load_pretrained

        variables, _ = load_pretrained(
            cfg,
            {"params": state.params, "batch_stats": state.batch_stats},
            logger,
        )
        state = state.replace(params=variables["params"],
                              batch_stats=variables["batch_stats"])
    tx, schedule = make_optimizer(cfg, epoch_size, state.params)
    state = state.replace(opt_state=tx.init(state.params))
    step_fn = make_train_step(
        model, tx, mesh, cfg.TRAIN.BATCH_IMAGES,
        rpn_batch_size=cfg.TRAIN.RPN_BATCH_SIZE,
        with_autofocus=cfg.TRAIN.AUTO_FOCUS,
        with_mask=cfg.TRAIN.WITH_MASK,
        rpn_only=cfg.TRAIN.ONLY_PROPOSAL,
        ohem_rois=(int(cfg.TRAIN.BATCH_ROIS_OHEM)
                   if cfg.TRAIN.ENABLE_OHEM else 0),
        pixel_means=cfg.network.PIXEL_MEANS,
    )

    if cfg.TRAIN.begin_epoch > 0:
        from sniper_tpu.train.checkpoint import load_checkpoint

        state = load_checkpoint(f"{out_dir}/checkpoints", state,
                                cfg.TRAIN.begin_epoch)
        logger.info(f"resumed from epoch {cfg.TRAIN.begin_epoch}")

    import itertools

    from sniper_tpu.parallel.distributed import global_min_steps

    key = jax.random.PRNGKey(cfg.TRAIN.seed)
    step = int(state.step)
    # prediction-side debug dumps (reference VisMetric,
    # lib/train_utils/metric.py:347-368) — pairs with the loader's
    # GT-side chip rendering under the same TRAIN.VISUALIZE flag.
    # RPN-only models have no detection head to dump.
    dumper = None
    last_host: dict = {}
    if bool(getattr(cfg.TRAIN, "VISUALIZE", False)) and \
            not cfg.TRAIN.ONLY_PROPOSAL:
        from sniper_tpu.train.vis_dump import PredictionDumper

        dumper = PredictionDumper(model, cfg)
    for epoch in range(cfg.TRAIN.begin_epoch, cfg.TRAIN.end_epoch):
        if epoch > cfg.TRAIN.begin_epoch:
            n_chips = loader.reset()
            logger.info(f"epoch {epoch}: {n_chips} chips")
        # every step is a collective over the global mesh: all processes
        # must run the same count, so truncate to the global minimum
        steps_this_epoch = global_min_steps(len(loader))
        tracker = MetricTracker()
        # Transfers are issued from the prefetch thread (shard_batch in
        # the producer generator) so the host->device copy of batch N+1
        # overlaps the device compute of step N, and metric scalars are
        # only materialized at the log boundary — a per-step float()
        # would block the host on step N before it could even dispatch
        # batch N+1's transfer (measured 589.7 vs 285.4 ms/step through
        # the relay, scripts/profile_transfer.py --sync_metrics).
        # truncation happens BEFORE the Prefetcher so the producer
        # thread exhausts and exits instead of parking forever on a
        # full queue holding device-resident batches
        def _tap(b):
            if dumper is not None:
                last_host["batch"] = b
                # this batch's own loader sequence index — recorded in
                # the dump payload so the pkl never claims step/batch
                # alignment it doesn't have (prefetch skew)
                last_host["seq"] = last_host.get("seq", -1) + 1
            return b

        # TWO pipeline stages, each with its own thread: batch ASSEMBLY
        # (CPU: imdecode/resize/targets) and host->device UPLOAD
        # (network/DMA, GIL-releasing) run concurrently instead of
        # serially in one producer. Through this box's HTTP relay the
        # upload of a 16-chip uint8 batch costs ~300-420 ms — serial
        # staging made the step pay assembly + upload + compute
        # (934.9 ms measured); the split pays ~max of the three.
        epoch_iter = iter(loader)
        if steps_this_epoch < len(loader):
            # multi-host truncation to the global min only; an
            # unconditional islice would abandon the epoch generator
            # one step early, which costs ProcessChipLoader a child
            # respawn every epoch
            epoch_iter = itertools.islice(epoch_iter, steps_this_epoch)
        host_batches = Prefetcher(_tap(b) for b in epoch_iter)
        staged = (shard_batch(mesh, b) for b in host_batches)
        pending: list = []

        def _flush():
            for m in pending:
                tracker.update(
                    jax.tree_util.tree_map(float, m), batch_size
                )
            pending.clear()

        for batch in Prefetcher(staged):
            key, sub = jax.random.split(key)
            state, metrics = step_fn(state, batch, sub)
            pending.append(metrics)
            step += 1
            if step % 20 == 0:
                _flush()
                lr = float(schedule(step))
                logger.info(tracker.format(epoch, step) + f"  lr={lr:.6f}")
            if dumper is not None and "batch" in last_host:
                # prediction-side debug dump (VisMetric analog); the
                # rendered chip may be prefetch-depth steps ahead of the
                # stepped batch — fine for a debug artifact
                p = dumper.maybe_dump(state, last_host["batch"], step,
                                      batch_seq=last_host.get("seq"))
                if p:
                    logger.info(f"dumped predictions to {p}")
        _flush()
        # HEAD_MARGIN_BINS clamp telemetry (models/heads.RCNNHead): warn
        # loudly if trained offsets approach/hit the stencil halo — a
        # silent quality failure, not a crash. The threshold is sown by
        # the head itself (offset_clamp_thr) so this log agrees with
        # the in-graph clamp_frac for any trans_std/pooled_size.
        em = tracker.means()
        if "offset_max" in em:
            margin = int(getattr(cfg.network, "HEAD_MARGIN_BINS", 1))
            thr = em.get("offset_clamp_thr", margin / (0.1 * 7))
            if em.get("offset_clamp_frac", 0.0) > 0 or \
                    em["offset_max"] > 0.8 * thr:
                logger.warning(
                    f"epoch {epoch}: head offsets near/over the margin-"
                    f"{margin} clamp (max |trans|={em['offset_max']:.3f}, "
                    f"clamp={thr:.3f}, clamp_frac="
                    f"{em.get('offset_clamp_frac', 0.0):.2e}) — raise "
                    f"network.HEAD_MARGIN_BINS to {margin + 1}"
                )
            else:
                logger.info(
                    f"epoch {epoch}: offset telemetry max |trans|="
                    f"{em['offset_max']:.3f} vs clamp {thr:.3f} "
                    f"(margin {margin}), clamp_frac="
                    f"{em.get('offset_clamp_frac', 0.0):.2e}"
                )
        # trunk DCN offset telemetry (models/resnet.sow_dcn_offset_stats):
        # how far the learned C5 offsets actually reach, in feature px.
        # This is the evidence for/against the bounded-window DCN fast
        # path (network.DEFORM_WINDOW) being lossless on this model.
        if "dcn_offset_max" in em:
            msg = (f"epoch {epoch}: trunk DCN offsets max |off|="
                   f"{em['dcn_offset_max']:.3f} feature px")
            if "dcn_offset_clamp_frac" in em:
                msg += (f", window clamp_frac="
                        f"{em['dcn_offset_clamp_frac']:.2e}")
                if em["dcn_offset_clamp_frac"] > 0:
                    logger.warning(
                        msg + " — offsets are being clamped; raise "
                        "network.DEFORM_WINDOW or set it to 0 (exact "
                        "gather path)"
                    )
                else:
                    logger.info(msg)
            else:
                logger.info(msg)
        save_checkpoint(f"{out_dir}/checkpoints", state, epoch + 1)
        logger.info(f"saved checkpoint epoch {epoch + 1}")


if __name__ == "__main__":
    main()
