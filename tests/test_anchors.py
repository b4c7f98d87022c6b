import numpy as np

from sniper_tpu.ops.anchors import generate_anchors, shift_anchors

# The canonical py-faster-rcnn anchor set for base 16, ratios (0.5,1,2),
# scales (8,16,32) — a published constant, used as a golden value.
GOLDEN_16 = np.array(
    [
        [-84.0, -40.0, 99.0, 55.0],
        [-176.0, -88.0, 191.0, 103.0],
        [-360.0, -184.0, 375.0, 199.0],
        [-56.0, -56.0, 71.0, 71.0],
        [-120.0, -120.0, 135.0, 135.0],
        [-248.0, -248.0, 263.0, 263.0],
        [-36.0, -80.0, 51.0, 95.0],
        [-80.0, -168.0, 95.0, 183.0],
        [-168.0, -344.0, 183.0, 359.0],
    ]
)


def test_generate_anchors_golden():
    a = generate_anchors(16, (0.5, 1, 2), (8, 16, 32))
    np.testing.assert_array_equal(a, GOLDEN_16)


def test_generate_anchors_sniper_count():
    a = generate_anchors(16, (0.5, 1, 2), (2, 4, 7, 10, 13, 16, 24))
    assert a.shape == (21, 4)
    # all centered on the base cell center 7.5
    ctr_x = (a[:, 0] + a[:, 2]) / 2
    np.testing.assert_allclose(ctr_x, 7.5)


def test_shift_anchors_layout():
    base = generate_anchors(16, (1,), (8,))
    all_a = shift_anchors(base, 2, 3, 16)
    assert all_a.shape == (6, 4)
    # position-major: entry k*A+a = base[a] + shift[k]; row order y-major
    np.testing.assert_array_equal(all_a[0], base[0])
    np.testing.assert_array_equal(all_a[1], base[0] + [16, 0, 16, 0])
    np.testing.assert_array_equal(all_a[3], base[0] + [0, 16, 0, 16])


def test_shift_anchors_per_position_block():
    base = generate_anchors(16, (0.5, 1, 2), (8, 16, 32))
    all_a = shift_anchors(base, 32, 32, 16)
    assert all_a.shape == (32 * 32 * 9, 4)
    np.testing.assert_array_equal(all_a[:9], base)
