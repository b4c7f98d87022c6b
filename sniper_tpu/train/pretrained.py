"""Pretrained backbone / reference-checkpoint import.

The reference never trains from scratch: it loads an ImageNet (or
OpenImagesV4) MXNet backbone and re-initializes only the new detection
layers (/root/reference/main_train.py:98-103,
/root/reference/lib/train_utils/utils.py:45-100 ``load_param``,
/root/reference/symbols/faster/resnet_mx_101_e2e.py:450-505
``init_weight_rcnn``). This module is the TPU-native equivalent:

- ``read_mxnet_params`` / ``save_mxnet_params``: a pure-NumPy parser /
  writer for the MXNet NDArray-list ``.params`` container (no mxnet
  dependency), so a reference user's existing ``resnet_mx_101-0000.params``
  backbones and trained SNIPER detector checkpoints import directly.
- ``import_reference_params``: maps the MXNet flat name space
  (``conv0_weight``, ``stage3_unit12_bn2_gamma``, ``fc_new_1_weight``...)
  onto this repo's flax tree with the layout conversions TPU needs
  (OIHW conv kernels -> HWIO, ``[out, C*P*P]`` NCHW-flattened FC weights
  -> ``[P*P*C, out]``). Anything NOT found in the checkpoint keeps its
  fresh initializer — that IS the reference's selective re-init: the
  detection layers (rpn_*, conv_new_*, fc_new_*, offsets) are absent
  from an ImageNet backbone, so they stay at init_weight_rcnn-equivalent
  random init (heads.py/init).
- ``verify_fixed_params``: the FIXED_PARAMS sanity check — refusing to
  freeze layers that were never loaded (frozen random weights can never
  train out).

Also accepts ``.npz`` files with the same flat MXNet names (with or
without the ``arg:``/``aux:`` prefixes) and torch ``.pt``/``.pth``
pickles holding such a flat dict, as conversion-friendly interchange.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass, field

import numpy as np

# ---------------------------------------------------------------------------
# MXNet .params container (NDArray::Save/Load, mxnet src/ndarray/ndarray.cc)
# ---------------------------------------------------------------------------

_LIST_MAGIC = 0x112  # kMXAPINDArrayListMagic
_NDARRAY_V1_MAGIC = 0xF993FAC8
_NDARRAY_V2_MAGIC = 0xF993FAC9
_NDARRAY_V3_MAGIC = 0xF993FACA

_MX_DTYPES = {
    0: np.dtype(np.float32), 1: np.dtype(np.float64),
    2: np.dtype(np.float16), 3: np.dtype(np.uint8),
    4: np.dtype(np.int32), 5: np.dtype(np.int8), 6: np.dtype(np.int64),
}
_MX_DTYPE_FLAGS = {v: k for k, v in _MX_DTYPES.items()}


class MXParamsError(ValueError):
    pass


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.off = 0

    def read(self, fmt: str):
        size = struct.calcsize(fmt)
        if self.off + size > len(self.buf):
            raise MXParamsError("truncated .params file")
        out = struct.unpack_from(fmt, self.buf, self.off)
        self.off += size
        return out if len(out) > 1 else out[0]

    def bytes(self, n: int) -> bytes:
        if self.off + n > len(self.buf):
            raise MXParamsError("truncated .params file")
        out = self.buf[self.off : self.off + n]
        self.off += n
        return out


def _plausible_tail(r: _Reader, dims) -> bool:
    """Validate the (dev_type, dev_id, type_flag) triple that follows a
    shape, without consuming it — used to disambiguate 4- vs 8-byte shape
    dims across MXNet versions."""
    try:
        dev_type, dev_id, type_flag = struct.unpack_from("<iii", r.buf, r.off)
    except struct.error:
        return False
    if not all(0 < d < 2**31 for d in dims):
        return False
    return (
        dev_type in (1, 2, 3, 5, 6)
        and 0 <= dev_id < 1024
        and type_flag in _MX_DTYPES
    )


def _read_shape(r: _Reader, ndim: int):
    """Shape dims: int64 each in nnvm-era files, uint32 in legacy ones.
    Try 8-byte first and fall back if the context triple after doesn't
    validate."""
    if ndim == 0:
        return ()
    start = r.off
    for fmt, size in (("<%dq" % ndim, 8 * ndim), ("<%dI" % ndim, 4 * ndim)):
        if start + size <= len(r.buf):
            dims = struct.unpack_from(fmt[:1] + fmt[1:], r.buf, start)
            r.off = start + size
            if _plausible_tail(r, dims):
                return tuple(int(d) for d in dims)
    raise MXParamsError("could not parse NDArray shape")


def _read_ndarray(r: _Reader) -> np.ndarray:
    magic = r.read("<I")
    if magic in (_NDARRAY_V2_MAGIC, _NDARRAY_V3_MAGIC):
        stype = r.read("<i")
        if stype not in (0, 1):  # kUndefinedStorage=-1 / kDefaultStorage
            raise MXParamsError(
                f"sparse NDArray storage (stype={stype}) not supported"
            )
        ndim = r.read("<i")
        shape = _read_shape(r, ndim)
    elif magic == _NDARRAY_V1_MAGIC:
        ndim = r.read("<I")
        shape = _read_shape(r, ndim)
    elif magic < 64:  # pre-V1 legacy: the magic word IS ndim
        shape = tuple(int(d) for d in r.read("<%dI" % magic)) if magic else ()
    else:
        raise MXParamsError(f"unrecognized NDArray magic 0x{magic:x}")
    dev_type, dev_id, type_flag = r.read("<iii")
    del dev_type, dev_id
    if type_flag not in _MX_DTYPES:
        raise MXParamsError(f"unknown dtype flag {type_flag}")
    dtype = _MX_DTYPES[type_flag]
    n = int(np.prod(shape, dtype=np.int64)) if shape else 1
    data = np.frombuffer(r.bytes(n * dtype.itemsize), dtype=dtype, count=n)
    return data.reshape(shape).copy()


def read_mxnet_params(path: str) -> dict[str, np.ndarray]:
    """Parse an MXNet ``.params`` file into {name: array}. Names keep the
    ``arg:``/``aux:`` prefixes; see ``strip_mx_prefixes``."""
    with open(path, "rb") as f:
        r = _Reader(f.read())
    if r.read("<Q") != _LIST_MAGIC:
        raise MXParamsError(f"{path}: not an MXNet NDArray-list file")
    r.read("<Q")  # reserved
    count = r.read("<Q")
    if count > 1_000_000:
        raise MXParamsError("implausible array count")
    arrays = [_read_ndarray(r) for _ in range(count)]
    n_names = r.read("<Q")
    if n_names != count:
        raise MXParamsError(f"{n_names} names for {count} arrays")
    names = []
    for _ in range(n_names):
        ln = r.read("<Q")
        names.append(r.bytes(ln).decode("utf-8"))
    return dict(zip(names, arrays))


def save_mxnet_params(path: str, arrays: dict[str, np.ndarray]) -> None:
    """Write {name: array} in the MXNet V2 NDArray-list format (dense
    fp32/fp16/int arrays; enough for params interchange and tests)."""
    out = [struct.pack("<QQQ", _LIST_MAGIC, 0, len(arrays))]
    for a in arrays.values():
        a = np.ascontiguousarray(a)
        if a.dtype not in _MX_DTYPE_FLAGS:
            a = a.astype(np.float32)
        out.append(struct.pack("<Ii", _NDARRAY_V2_MAGIC, 0))
        out.append(struct.pack("<i", a.ndim))
        out.append(struct.pack("<%dq" % a.ndim, *a.shape))
        out.append(struct.pack("<iii", 1, 0, _MX_DTYPE_FLAGS[a.dtype]))
        out.append(a.tobytes())
    out.append(struct.pack("<Q", len(arrays)))
    for name in arrays:
        b = name.encode("utf-8")
        out.append(struct.pack("<Q", len(b)))
        out.append(b)
    with open(path, "wb") as f:
        f.write(b"".join(out))


def strip_mx_prefixes(flat: dict[str, np.ndarray]) -> dict[str, np.ndarray]:
    """Drop the ``arg:``/``aux:`` save prefixes (reference load_checkpoint,
    utils.py:45-60)."""
    out = {}
    for k, v in flat.items():
        if k.startswith(("arg:", "aux:")):
            k = k[4:]
        out[k] = np.asarray(v)
    return out


def load_flat_params(path: str) -> dict[str, np.ndarray]:
    """Load a flat {mxnet_name: array} dict from .params/.npz/.pt(h)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".params":
        flat = read_mxnet_params(path)
    elif ext == ".npz":
        with np.load(path) as z:
            flat = {k: z[k] for k in z.files}
    elif ext in (".pt", ".pth"):
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict) and "state_dict" in obj:
            obj = obj["state_dict"]
        flat = {
            k: (v.detach().cpu().numpy() if hasattr(v, "detach") else v)
            for k, v in obj.items()
        }
    else:
        raise MXParamsError(f"unsupported pretrained format: {path}")
    return strip_mx_prefixes(flat)


def resolve_pretrained_path(prefix: str, epoch: int = 0) -> str:
    """Reference convention: ``prefix`` + ``-%04d.params`` (utils.py:45).
    A literal existing file path (any supported extension) also works."""
    if os.path.exists(prefix):
        return prefix
    for cand in (f"{prefix}-{epoch:04d}.params", f"{prefix}.params",
                 f"{prefix}.npz", f"{prefix}-{epoch:04d}.npz"):
        if os.path.exists(cand):
            return cand
    raise FileNotFoundError(
        f"no pretrained file for prefix {prefix!r} (epoch {epoch})"
    )


# ---------------------------------------------------------------------------
# MXNet name space -> flax tree
# ---------------------------------------------------------------------------

def _t_conv(w):
    """OIHW -> HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def _t_deconv(w):
    """MXNet Deconvolution [in, out, kh, kw] -> flax ConvTranspose HWIO."""
    return np.transpose(w, (2, 3, 0, 1))


def _t_fc(w):
    """[out, in] -> [in, out]."""
    return np.transpose(w)


def _t_fc_from_pool(w, channels=256):
    """FC over an NCHW-flattened pooled feature -> NHWC-flattened.

    MXNet flattens the [R, C, P, P] pooled tensor to (C*P*P); our Dense
    sees [R, P, P, C] flattened to (P*P*C). [out, C*P*P] -> [P*P*C, out].
    """
    out, inp = w.shape
    pp = inp // channels
    p = int(round(pp ** 0.5))
    if p * p * channels != inp:
        raise MXParamsError(f"cannot infer pooled layout from FC in={inp}")
    return (
        w.reshape(out, channels, p, p).transpose(2, 3, 1, 0).reshape(inp, out)
    )


@dataclass
class ImportReport:
    loaded: list = field(default_factory=list)       # (flax_path, mx_name)
    missing: list = field(default_factory=list)      # mapped but not in ckpt
    mismatched: list = field(default_factory=list)   # (path, mx, got, want)
    unmapped_keys: list = field(default_factory=list)  # ckpt keys unused

    @property
    def loaded_names(self) -> set:
        return {mx for _, mx in self.loaded}

    def summary(self) -> str:
        return (
            f"loaded {len(self.loaded)} tensors, {len(self.missing)} mapped "
            f"params absent from checkpoint (kept fresh init), "
            f"{len(self.mismatched)} shape mismatches, "
            f"{len(self.unmapped_keys)} checkpoint keys unused"
        )


def _bn_entries(scope_path, mx_prefix, has_scale=True):
    """(kind, flax_path, mx_name, transform) rows for one BatchNorm."""
    rows = []
    if has_scale:
        rows.append(("params", scope_path + ("scale",), mx_prefix + "_gamma",
                     None))
    rows.append(("params", scope_path + ("bias",), mx_prefix + "_beta", None))
    rows.append(("batch_stats", scope_path + ("mean",),
                 mx_prefix + "_moving_mean", None))
    rows.append(("batch_stats", scope_path + ("var",),
                 mx_prefix + "_moving_var", None))
    return rows


def _tree_get(tree, path):
    node = tree
    for p in path:
        if not isinstance(node, dict) or p not in node:
            return None
        node = node[p]
    return node


def _tree_set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    node[path[-1]] = value


def _mapping_rows(params, batch_stats):
    """Build every (collection, flax_path, mx_name, transform) this model
    knows how to import, by walking the actual variable tree."""
    rows = []
    # a full detector nests the backbone under "trunk"; a bare
    # ResNetTrunk variable tree has the stem at the root
    if "trunk" in params:
        trunk, tp = params["trunk"], ("trunk",)
    elif "conv0" in params or "bn_data" in params:
        trunk, tp = params, ()
    else:
        trunk, tp = {}, ()
    if "bn_data" in trunk:
        rows += _bn_entries(tp + ("bn_data",), "bn_data", has_scale=False)
    if "conv0" in trunk:
        rows.append(("params", tp + ("conv0", "kernel"), "conv0_weight",
                     _t_conv))
    if "bn0" in trunk:
        rows += _bn_entries(tp + ("bn0",), "bn0")
    for unit in sorted(k for k in trunk if k.startswith("stage")):
        u = trunk[unit]
        for bn in ("bn1", "bn2", "bn3"):
            if bn in u:
                rows += _bn_entries(tp + (unit, bn), f"{unit}_{bn}")
        for cv in ("conv1", "conv2", "conv3", "sc"):
            if cv in u:
                rows.append(("params", tp + (unit, cv, "kernel"),
                             f"{unit}_{cv}_weight", _t_conv))
        if "conv2_kernel" in u:  # deformable unit: plain conv2 weights map
            rows.append(("params", tp + (unit, "conv2_kernel"),
                         f"{unit}_conv2_weight", _t_conv))
        if "offset" in u:
            rows.append(("params", tp + (unit, "offset", "kernel"),
                         f"{unit}_offset_weight", _t_conv))
            rows.append(("params", tp + (unit, "offset", "bias"),
                         f"{unit}_offset_bias", None))

    def conv_layer(path, mx):
        rows.append(("params", path + ("kernel",), mx + "_weight", _t_conv))
        rows.append(("params", path + ("bias",), mx + "_bias", None))

    if "conv_new_1" in params:
        conv_layer(("conv_new_1",), "conv_new_1")
    rpn = params.get("rpn", {})
    for name in ("rpn_conv_3x3", "rpn_cls_score", "rpn_bbox_pred"):
        if name in rpn:
            conv_layer(("rpn", name), name)
    af = params.get("autofocus", {})
    for name in ("conv_new_2", "conv_new_3", "conv_new_out"):
        if name in af:
            conv_layer(("autofocus", name), name)
    rcnn = params.get("rcnn", {})
    for name, tr in (("offset", _t_fc_from_pool), ("fc_new_1", _t_fc_from_pool),
                     ("fc_new_2", _t_fc), ("cls_score", _t_fc),
                     ("bbox_pred", _t_fc)):
        if name in rcnn:
            rows.append(("params", ("rcnn", name, "kernel"), f"{name}_weight",
                         tr))
            rows.append(("params", ("rcnn", name, "bias"), f"{name}_bias",
                         None))
    mask = params.get("mask", {})
    for k in sorted(mask):
        if k.startswith("mask_conv"):
            conv_layer(("mask", k), k)
    if "mask_deconv" in mask:
        rows.append(("params", ("mask", "mask_deconv", "kernel"),
                     "mask_deconv_weight", _t_deconv))
        rows.append(("params", ("mask", "mask_deconv", "bias"),
                     "mask_deconv_bias", None))
    if "mask_out" in mask:
        conv_layer(("mask", "mask_out"), "mask_out")
    del batch_stats
    return rows


def import_reference_params(flat, variables, *, strict: bool = False):
    """Map a flat MXNet-named dict into the detector's variables.

    Returns (new_variables, ImportReport). Every variable NOT present in
    ``flat`` keeps its current (fresh-init) value — the reference's
    selective re-init (init_weight_rcnn) falls out of this for free
    because backbone checkpoints simply lack the detection-layer names.
    """
    import jax

    # tree_map rebuilds every dict level, so in-place _tree_set below
    # never mutates the caller's tree; leaves are np views (no copy)
    variables = jax.tree_util.tree_map(np.asarray, _to_plain(variables))
    params = variables.get("params", {})
    stats = variables.get("batch_stats", {})
    rows = _mapping_rows(params, stats)
    report = ImportReport()
    consumed = set()
    for coll, path, mx_name, tr in rows:
        tree = params if coll == "params" else stats
        target = _tree_get(tree, path)
        if target is None:
            continue
        if mx_name not in flat:
            report.missing.append((coll,) + path)
            continue
        src = np.asarray(flat[mx_name])
        try:
            val = tr(src) if tr else src
        except MXParamsError:
            val = src
        if tuple(val.shape) != tuple(np.shape(target)):
            report.mismatched.append(
                ((coll,) + path, mx_name, tuple(val.shape),
                 tuple(np.shape(target)))
            )
            if strict:
                raise MXParamsError(
                    f"shape mismatch importing {mx_name} -> {path}: "
                    f"{val.shape} vs {np.shape(target)}"
                )
            continue
        _tree_set(tree, path, val.astype(np.asarray(target).dtype))
        report.loaded.append((path, mx_name))
        consumed.add(mx_name)
    # keys the reference strips/ignores too: _test-folded copies
    # (utils.py:96-99) and anything we have no layer for
    report.unmapped_keys = sorted(
        k for k in flat if k not in consumed
    )
    if strict and report.missing:
        raise MXParamsError(f"missing pretrained tensors: {report.missing}")
    return variables, report


def _to_plain(tree):
    """FrozenDict-or-dict -> plain nested dict."""
    try:
        import flax

        return flax.core.unfreeze(tree)
    except Exception:
        return tree


def verify_fixed_params(report: ImportReport, params, fixed_prefixes):
    """Raise if a FIXED_PARAMS prefix would freeze weights that were not
    loaded from the checkpoint (frozen random weights can never recover;
    reference relies on get_fixed_param_names only matching pretrained
    layers, utils.py:103-117)."""
    loaded_paths = {tuple(p) for p, _ in report.loaded}
    problems = []

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + (k,))
            return
        if any(
            any(str(part).startswith(pref) for part in path)
            for pref in (fixed_prefixes or ())
        ):
            if path not in loaded_paths:
                problems.append(path)

    walk(_to_plain(params), ())
    if problems:
        names = ", ".join("/".join(p) for p in problems[:8])
        raise MXParamsError(
            f"FIXED_PARAMS freezes {len(problems)} parameters that were NOT "
            f"loaded from the pretrained checkpoint (e.g. {names}); frozen "
            "random weights cannot train — fix network.pretrained or "
            "FIXED_PARAMS"
        )


def load_pretrained(cfg, variables, logger=None):
    """main_train entry: restore cfg.network.pretrained into variables.

    Returns (variables, report or None). No-op when the config leaves
    ``network.pretrained`` empty (scratch training stays supported).
    """
    prefix = str(cfg.network.pretrained or "").strip()
    if not prefix:
        return variables, None
    path = resolve_pretrained_path(prefix, int(cfg.network.pretrained_epoch))
    flat = load_flat_params(path)
    variables, report = import_reference_params(flat, variables)
    if report.mismatched:
        raise MXParamsError(
            "pretrained import shape mismatches: "
            + "; ".join(
                f"{mx}->{'/'.join(map(str, p))} got {g} want {w}"
                for p, mx, g, w in report.mismatched[:8]
            )
        )
    verify_fixed_params(report, variables.get("params", {}),
                        cfg.network.FIXED_PARAMS)
    if logger is not None:
        logger.info(f"pretrained {path}: {report.summary()}")
    return variables, report
