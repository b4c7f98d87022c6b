"""ChipLoader end-to-end on synthetic images (no dataset needed)."""

import numpy as np
import pytest

from sniper_tpu.config import default_config
from sniper_tpu.data.loader import ChipLoader, Prefetcher, process_chip_image


def synth_image_loader(path):
    """Deterministic fake image keyed by the 'path' string."""
    seed = abs(hash(path)) % (2**31)
    rng = np.random.RandomState(seed)
    h, w = (int(s) for s in path.split(":")[1].split("x"))
    return rng.randint(0, 255, (h, w, 3)).astype(np.uint8)


def make_roidb(rng, n_images=4):
    roidb = []
    for i in range(n_images):
        w, h = 800, 600
        n_gt = 6
        x1 = rng.uniform(0, w - 300, n_gt)
        y1 = rng.uniform(0, h - 300, n_gt)
        s = rng.uniform(20, 250, n_gt)
        boxes = np.stack([x1, y1, np.minimum(x1 + s, w - 1),
                          np.minimum(y1 + s, h - 1)], 1).astype(np.float32)
        roidb.append({
            "image": f"img{i}:{h}x{w}",
            "width": w,
            "height": h,
            "boxes": boxes,
            "max_overlaps": np.ones(n_gt),
            "max_classes": rng.randint(1, 5, n_gt),
            "flipped": False,
        })
    return roidb


def make_cfg():
    cfg = default_config()
    cfg.TRAIN.SCALES = [(1400, 2000), (800, 1280), (-1, 512)]
    cfg.TRAIN.VALID_RANGES = [(-1, 80), (32, 150), (120, -1)]
    cfg.TRAIN.USE_NEG_CHIPS = False
    cfg.network.ANCHOR_SCALES = (2, 4, 7)
    cfg.network.ANCHOR_RATIOS = (0.5, 1, 2)
    cfg.network.NUM_ANCHORS = 9
    cfg.network.PIXEL_MEANS = np.array([103.9, 116.8, 123.7])
    return cfg


def test_loader_epoch_and_batches(rng):
    cfg = make_cfg()
    roidb = make_roidb(rng)
    loader = ChipLoader(roidb, cfg, batch_size=2, image_loader=synth_image_loader)
    n_chips = loader.reset()
    assert n_chips > 0
    assert loader.size % 2 == 0

    batches = list(iter(loader))
    assert len(batches) == len(loader)
    b = batches[0]
    A = 9
    assert b["data"].shape == (2, 512, 512, 3)
    assert b["im_info"].shape == (2, 3)
    assert b["valid_ranges"].shape == (2, 2)
    # default sparse RPN targets
    assert b["rpn_pids"].shape == (2, 256)
    assert b["rpn_label_vals"].shape == (2, 256)
    assert b["fg_pids"].shape == (2, 128)
    assert b["fg_targets"].shape == (2, 128, 4)
    assert b["gt_boxes"].shape == (2, 100, 5)
    # label values are only {-1, 0, 1}; pids in grid range
    assert set(np.unique(b["rpn_label_vals"])).issubset({-1.0, 0.0, 1.0})
    assert b["rpn_pids"].max() < A * 32 * 32
    # at least some gt boxes present somewhere in the epoch
    assert any((bb["gt_boxes"][:, :, 4] >= 0).any() for bb in batches)


def test_loader_valid_range_scaling(rng):
    cfg = make_cfg()
    roidb = make_roidb(rng)
    loader = ChipLoader(roidb, cfg, batch_size=2, image_loader=synth_image_loader)
    loader.reset()
    b = next(iter(loader))
    # ranges are in scaled chip pixels: within [0, 512] bounds sanity
    assert (b["valid_ranges"][:, 0] >= 0).all()
    im_scales = b["im_info"][:, 2]
    assert (im_scales > 0).all()


def test_loader_neg_chips(rng):
    cfg = make_cfg()
    cfg.TRAIN.USE_NEG_CHIPS = True
    roidb = make_roidb(rng, n_images=2)
    # add many stray proposals to force neg chips
    for r in roidb:
        n = 300
        px = rng.uniform(0, r["width"] - 60, n)
        py = rng.uniform(0, r["height"] - 60, n)
        props = np.stack([px, py, px + rng.uniform(10, 50, n),
                          py + rng.uniform(10, 50, n)], 1).astype(np.float32)
        r["boxes"] = np.vstack([r["boxes"], props])
        r["max_overlaps"] = np.concatenate(
            [r["max_overlaps"], np.full(n, 0.2)])
        r["max_classes"] = np.concatenate(
            [r["max_classes"], np.zeros(n, int)])
    loader = ChipLoader(roidb, cfg, batch_size=2, image_loader=synth_image_loader)
    n_with_neg = loader.reset()
    cfg.TRAIN.USE_NEG_CHIPS = False
    loader2 = ChipLoader(roidb, cfg, batch_size=2, image_loader=synth_image_loader)
    n_without = loader2.reset()
    assert n_with_neg > n_without, "neg chips must add to the chip count"


def test_process_chip_image_padding():
    im = np.full((100, 200, 3), 100, np.uint8)
    out = process_chip_image(im, [0, 0, 200, 100], 1.0, 512, np.array([1.0, 2, 3]))
    assert out.shape == (512, 512, 3)
    # RGB conversion: out channel 0 = BGR channel 2 - mean[2]
    assert out[0, 0, 0] == 100 - 3
    assert out[0, 0, 2] == 100 - 1
    # padding is zero
    assert (out[100:, :, :] == 0).all() and (out[:, 200:, :] == 0).all()


def test_process_chip_image_upscale():
    im = np.zeros((100, 100, 3), np.uint8)
    out = process_chip_image(im, [0, 0, 100, 100], 2.7, 512, np.zeros(3))
    assert out.shape == (512, 512, 3)
    # 100*2.7 = 270 pixels of content
    assert (out[:270, :270] == 0).all()


def test_uint8_pipeline_bit_exact(rng):
    """The default uint8 loader output, normalized on device via
    device_normalize over data_extent, must equal the fp32 host path
    BIT-EXACTLY (same mean subtraction, exact-zero padding)."""
    import jax.numpy as jnp

    from sniper_tpu.infer.tester import device_normalize

    cfg = make_cfg()
    roidb = make_roidb(rng)
    lu = ChipLoader(roidb, cfg, batch_size=2,
                    image_loader=synth_image_loader, seed=7)
    lf = ChipLoader(roidb, cfg, batch_size=2,
                    image_loader=synth_image_loader, seed=7,
                    uint8_data=False)
    lu.reset()
    lf.reset()
    bu = next(iter(lu))
    bf = next(iter(lf))
    assert bu["data"].dtype == np.uint8
    assert bf["data"].dtype == np.float32
    assert "data_extent" in bu and "data_extent" not in bf
    norm = device_normalize(
        jnp.asarray(bu["data"]), jnp.asarray(bu["data_extent"]),
        cfg.network.PIXEL_MEANS,
    )
    assert np.array_equal(np.asarray(norm), bf["data"])
    # every other key identical (same seed -> same schedule/rng)
    for k in bf:
        if k != "data":
            assert np.array_equal(bu[k], bf[k]), k


def test_sparse_targets_loss_matches_dense(rng):
    """The default sparse RPN targets give the same loss values as the
    dense grids through the real loader (same seed -> same sampling)."""
    import jax.numpy as jnp

    from sniper_tpu.models.losses import (
        rpn_bbox_loss,
        rpn_bbox_loss_sparse,
        rpn_cls_loss,
        rpn_cls_loss_sparse,
    )

    cfg = make_cfg()
    roidb = make_roidb(rng)
    ls = ChipLoader(roidb, cfg, batch_size=2,
                    image_loader=synth_image_loader, seed=3)
    ld = ChipLoader(roidb, cfg, batch_size=2,
                    image_loader=synth_image_loader, seed=3,
                    sparse_targets=False)
    ls.reset()
    ld.reset()
    bs = next(iter(ls))
    bd = next(iter(ld))
    assert "rpn_pids" in bs and "label" not in bs
    assert bs["rpn_pids"].shape == (2, 256)
    assert bs["fg_targets"].shape == (2, 128, 4)
    B, A, fh, fw = 2, 9, 32, 32
    logits = jnp.asarray(rng.randn(B, fh, fw, 2, A).astype(np.float32))
    pred = jnp.asarray(rng.randn(B, 4 * A, fh, fw).astype(np.float32))
    cs = rpn_cls_loss_sparse(logits, jnp.asarray(bs["rpn_pids"]),
                             jnp.asarray(bs["rpn_label_vals"]))
    cd = rpn_cls_loss(logits, jnp.asarray(bd["label"]))
    np.testing.assert_allclose(float(cs), float(cd), rtol=1e-5)
    vs = rpn_bbox_loss_sparse(pred, jnp.asarray(bs["fg_pids"]),
                              jnp.asarray(bs["fg_targets"]), B)
    vd = rpn_bbox_loss(pred, jnp.asarray(bd["bbox_target"]),
                       jnp.asarray(bd["bbox_weight"]), B)
    np.testing.assert_allclose(float(vs), float(vd), rtol=1e-5)


def test_prefetcher_order(rng):
    items = [{"x": np.array([i])} for i in range(7)]
    got = list(Prefetcher(items))
    assert [int(g["x"][0]) for g in got] == list(range(7))


def test_loader_fewer_chips_than_batch(rng):
    """Cyclic padding when the roidb yields fewer chips than one batch."""
    cfg = make_cfg()
    roidb = make_roidb(rng, n_images=1)
    loader = ChipLoader(roidb, cfg, batch_size=16,
                        image_loader=synth_image_loader)
    n = loader.reset()
    assert 0 < n < 16
    assert loader.size % 16 == 0
    assert len(loader.schedule) == loader.size
    batches = list(iter(loader))
    assert len(batches) == len(loader) >= 1
    assert batches[0]["data"].shape[0] == 16


def test_sparse_targets_rpn_only_total_loss(rng):
    """TRAIN.ONLY_PROPOSAL (phase-1 of the neg-chip pipeline) must work
    with the loader's default sparse targets."""
    import jax.numpy as jnp

    from sniper_tpu.models.losses import total_loss

    B, A, fh, fw = 2, 9, 32, 32
    pids = np.tile(np.arange(256, dtype=np.int32), (B, 1))
    batch = {
        "rpn_pids": pids,
        "rpn_label_vals": rng.choice([0.0, 1.0], (B, 256)).astype(np.float32),
        "fg_pids": pids[:, :128],
        "fg_targets": (rng.randn(B, 128, 4) * 0.1).astype(np.float32),
    }
    outputs = {
        "rpn_cls_logits": jnp.asarray(
            rng.randn(B, fh, fw, 2, A).astype(np.float32)),
        "rpn_bbox_pred": jnp.asarray(
            rng.randn(B, 4 * A, fh, fw).astype(np.float32)),
    }
    loss, metrics = total_loss(outputs, batch, batch_images=B, rpn_only=True)
    assert np.isfinite(float(loss))
    assert set(metrics) == {"rpn_cls_loss", "rpn_bbox_loss", "loss"}


def test_reset_threaded_matches_serial(rng):
    """Per-epoch chip pipeline must produce identical chips regardless
    of TRAIN.NUM_THREAD (per-image derived RNG, no shared stream)."""
    roidb_a = make_roidb(rng)
    roidb_b = [dict(r) for r in roidb_a]
    cfg_s = make_cfg()
    cfg_s.TRAIN.USE_NEG_CHIPS = False
    cfg_t = make_cfg()
    cfg_t.TRAIN.USE_NEG_CHIPS = False
    cfg_t.TRAIN.NUM_THREAD = 4
    ls = ChipLoader(roidb_a, cfg_s, batch_size=2,
                    image_loader=synth_image_loader, seed=11)
    lt = ChipLoader(roidb_b, cfg_t, batch_size=2,
                    image_loader=synth_image_loader, seed=11)
    n_s = ls.reset()
    n_t = lt.reset()
    assert n_s == n_t
    assert ls.schedule == lt.schedule
    for ra, rb in zip(roidb_a, roidb_b):
        assert len(ra["crops"]) == len(rb["crops"])
        for ca, cb in zip(ra["crops"], rb["crops"]):
            np.testing.assert_array_equal(ca.box, cb.box)
            assert ca.im_scale == cb.im_scale


def test_prefetcher_propagates_producer_errors():
    """A failing iterator must abort the consumer, not silently
    truncate (eval on partial results would look 'successful')."""
    def gen():
        yield {"x": np.array([0])}
        raise RuntimeError("decode failed")

    import pytest

    with pytest.raises(RuntimeError, match="decode failed"):
        list(Prefetcher(gen()))


def test_training_chip_visualization(rng, tmp_path):
    """TRAIN.VISUALIZE renders every visualization_freq-th schedule
    slot's chip with its gt boxes to visualization_path (reference
    MNIteratorE2E.visualize analog); boxes land inside the chip."""
    import cv2

    cfg = make_cfg()
    cfg.TRAIN.VISUALIZE = True
    cfg.TRAIN.visualization_path = str(tmp_path / "vis")
    cfg.TRAIN.visualization_freq = 3
    roidb = make_roidb(rng)
    loader = ChipLoader(roidb, cfg, batch_size=2,
                        image_loader=synth_image_loader)
    loader.reset()
    n = min(7, loader.size)
    for pos in range(n):
        loader._sample(pos)
    import glob
    import os

    files = sorted(glob.glob(os.path.join(str(tmp_path / "vis"), "*.jpg")))
    # slots 0, 3, 6 -> 3 renders (epoch counter 1 after first reset)
    assert len(files) == (n + 2) // 3, files
    assert all("chip_e1_" in os.path.basename(f) for f in files)
    im = cv2.imread(files[0])
    assert im is not None and im.shape == (512, 512, 3)
    # the green gt rectangles actually drew: green-dominant pixels exist
    g = im[:, :, 1].astype(int) - im[:, :, [0, 2]].astype(int).max(axis=2)
    assert (g > 100).sum() > 50, "expected drawn gt rectangles"

    # off by default: no renders
    cfg2 = make_cfg()
    loader2 = ChipLoader(roidb, cfg2, batch_size=2,
                         image_loader=synth_image_loader)
    loader2.reset()
    assert loader2.vis_path is None


def test_save_training_chip_fp32_reconstruction(tmp_path):
    """fp32 chips carry RGB pixels with the BGR-ordered cfg PIXEL_MEANS
    subtracted reversed (loader._build_sample); the debug render must
    undo exactly that, or R/B each get the other's mean (~20/channel
    tint)."""
    import cv2

    from sniper_tpu.utils.visualization import save_training_chip

    pixel_means = [103.9, 116.8, 123.7]  # cfg convention: BGR order
    r = np.random.RandomState(0)
    rgb = r.randint(30, 220, (64, 64, 3)).astype(np.uint8)
    norm = rgb.astype(np.float32) - np.asarray(
        pixel_means, np.float32)[::-1]
    sample = {"data": norm,
              "gt_boxes": np.full((1, 5), -1.0, np.float32)}
    p = save_training_chip(sample, pixel_means, str(tmp_path / "c.png"))
    back = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
    np.testing.assert_allclose(back.astype(int), rgb.astype(int), atol=1)


# slow set: spawns a 2-process pool (interpreter startup dominates)
@pytest.mark.slow
def test_reroll_process_pool_matches_inprocess(rng):
    """TRAIN.NUM_PROCESS > 1 (reference Pool(NUM_PROCESS) analog) must
    produce bit-identical chips/assignments to the in-process re-roll:
    same per-image seeds, same rng consumption order."""
    from sniper_tpu.config import default_config
    from sniper_tpu.data.loader import ChipLoader

    def make(nproc):
        cfg = default_config()
        cfg.TRAIN.SCALES = [(-1, 128), (-1, 256)]
        cfg.TRAIN.VALID_RANGES = [(-1, 60), (40, -1)]
        cfg.TRAIN.CHIP_SIZE = 128
        cfg.TRAIN.USE_NEG_CHIPS = True
        cfg.TRAIN.NUM_PROCESS = nproc
        cfg.TRAIN.NUM_THREAD = 1
        r2 = np.random.RandomState(3)
        roidb = []
        for i in range(6):
            n = 7
            x1 = r2.uniform(0, 150, n)
            y1 = r2.uniform(0, 120, n)
            s = r2.uniform(10, 100, n)
            boxes = np.stack(
                [x1, y1, np.minimum(x1 + s, 255), np.minimum(y1 + s, 191)],
                1).astype(np.float32)
            # rows 0..4 gt, rows 5..6 proposals (overlap < 1)
            mo = np.ones(n); mo[5:] = 0.5
            roidb.append({
                "image": f"im{i}", "width": 256, "height": 192,
                "boxes": boxes, "max_overlaps": mo,
                "max_classes": r2.randint(1, 5, n), "flipped": False,
            })
        loader = ChipLoader(roidb, cfg, batch_size=2, seed=11)
        loader.reset()
        return loader

    a = make(0)
    b = make(2)
    assert a.size == b.size
    assert [tuple(s) for s in a.schedule] == [tuple(s) for s in b.schedule]
    for ra, rb in zip(a.roidb, b.roidb):
        assert len(ra["crops"]) == len(rb["crops"])
        for ca, cb in zip(ra["crops"], rb["crops"]):
            np.testing.assert_array_equal(np.asarray(ca.box),
                                          np.asarray(cb.box))
            assert ca.scale_idx == cb.scale_idx
        for pa, pb in zip(ra["props_in_chips"], rb["props_in_chips"]):
            np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
