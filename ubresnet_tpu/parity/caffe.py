"""Caffe graph executor — the 2018-paper baseline engine, on TPU.

Re-provides the reference's Caffe1 parity rig
(caffe/run_caffe_precropped.py: prototxt + per-plane .caffemodel →
per-pixel softmax scores) natively: the prototxt (protobuf text format)
parses into a layer DAG, the .caffemodel (protobuf binary) parses via
the wire-format walker, and the graph executes as one jitted NHWC XLA
program. "All development will be benchmarked against this model"
(caffe/README.md:9-13) — this module is that oracle.

Supported ops (the full dllee_ssnet2018.prototxt vocabulary):
Input, Convolution (groups/dilation), Deconvolution (grouped bilinear
expanded dense), BatchNorm+Scale (folded affine, TEST mode), ReLU,
Pooling (MAX, caffe ceil semantics), Concat, Eltwise (SUM/PROD/MAX),
Softmax, Dropout (TEST no-op), Crop.

Caffe semantics preserved exactly:
  * pooling output size uses ceil + the boundary clip rule
  * deconv out = s(in-1)+k-2p via input-dilated conv
  * BatchNorm blobs are (mean, var, scale_factor); TEST-mode stats
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ubresnet_tpu.parity import protobuf_lite as pb


# ------------------------------------------------------- prototxt text


def parse_prototxt(text: str) -> Dict[str, Any]:
    """Protobuf text format → dict (repeated keys become lists)."""
    tokens = _tokenize(text)
    pos = 0
    out: Dict[str, Any] = {}
    while pos < len(tokens):
        pos = _parse_entry(tokens, pos, out)
    return out


def _tokenize(text: str) -> List[str]:
    out: List[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "#":
            while i < n and text[i] != "\n":
                i += 1
        elif c in " \t\r\n,":
            i += 1
        elif c in "{}:":
            out.append(c)
            i += 1
        elif c == '"':
            j = text.index('"', i + 1)
            out.append(text[i : j + 1])
            i = j + 1
        else:
            j = i
            while j < n and text[j] not in ' \t\r\n,{}:#"':
                j += 1
            out.append(text[i:j])
            i = j
    return out


def _parse_entry(tokens, pos, out) -> int:
    key = tokens[pos]
    pos += 1
    if pos < len(tokens) and tokens[pos] == ":":
        pos += 1
    if pos < len(tokens) and tokens[pos] == "{":
        val: Dict[str, Any] = {}
        pos += 1
        while tokens[pos] != "}":
            pos = _parse_entry(tokens, pos, val)
        pos += 1
    else:
        val = _scalar(tokens[pos])
        pos += 1
    if key in out:
        if not isinstance(out[key], list):
            out[key] = [out[key]]
        out[key].append(val)
    else:
        out[key] = val
    return pos


def _scalar(t):
    if t.startswith('"'):
        return t[1:-1]
    low = t.lower()
    if low in ("true", "false"):
        return low == "true"
    try:
        return int(t)
    except ValueError:
        pass
    try:
        return float(t)
    except ValueError:
        pass
    return t  # enum like MAX / SUM


def _as_list(v) -> list:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


# --------------------------------------------------------- caffemodel


# caffe.proto field numbers
_NET_LAYER = 100  # NetParameter.layer (LayerParameter)
_NET_LAYERS_V1 = 2  # NetParameter.layers (V1LayerParameter)
_LAYER_NAME, _LAYER_TYPE, _LAYER_BLOBS = 1, 2, 7
_V1_NAME, _V1_BLOBS = 4, 6
_BLOB_DATA, _BLOB_SHAPE = 5, 7
_BLOB_NUM, _BLOB_CH, _BLOB_H, _BLOB_W = 1, 2, 3, 4
_SHAPE_DIM = 1


def _parse_blob(buf: memoryview) -> np.ndarray:
    data: List[float] = []
    shape: List[int] = []
    legacy = {}
    for field, wire, val in pb.iter_fields(buf):
        if field == _BLOB_DATA:
            data.extend(pb.parse_packed_floats(val, wire))
        elif field == _BLOB_SHAPE:
            for f2, w2, v2 in pb.iter_fields(val):
                if f2 == _SHAPE_DIM:
                    if w2 == pb.WIRE_VARINT:
                        shape.append(v2)
                    else:  # packed varints
                        p = 0
                        while p < len(v2):
                            d, p = pb.read_varint(v2, p)
                            shape.append(d)
        elif field in (_BLOB_NUM, _BLOB_CH, _BLOB_H, _BLOB_W):
            legacy[field] = val
    arr = np.asarray(data, np.float32)
    if shape:
        arr = arr.reshape(shape)
    elif legacy:
        dims = [legacy.get(k, 1) for k in (_BLOB_NUM, _BLOB_CH, _BLOB_H, _BLOB_W)]
        arr = arr.reshape(dims)
    return arr


def parse_caffemodel(path: str) -> Dict[str, List[np.ndarray]]:
    """.caffemodel → {layer_name: [blob arrays]} (new + V1 layers)."""
    with open(path, "rb") as f:
        buf = memoryview(f.read())
    out: Dict[str, List[np.ndarray]] = {}
    for field, wire, val in pb.iter_fields(buf):
        if field not in (_NET_LAYER, _NET_LAYERS_V1):
            continue
        name = None
        blobs: List[np.ndarray] = []
        name_field = _LAYER_NAME if field == _NET_LAYER else _V1_NAME
        blob_field = _LAYER_BLOBS if field == _NET_LAYER else _V1_BLOBS
        for f2, w2, v2 in pb.iter_fields(val):
            if f2 == name_field and w2 == pb.WIRE_BYTES:
                name = bytes(v2).decode()
            elif f2 == blob_field:
                blobs.append(_parse_blob(v2))
        if name and blobs:
            out[name] = blobs
    return out


def write_caffemodel(path: str, layers: Dict[str, List[np.ndarray]]):
    """Serialize {name: blobs} as a NetParameter binary (test fixtures)."""
    body = b""
    for name, blobs in layers.items():
        layer = pb.field_string(_LAYER_NAME, name)
        for b in blobs:
            blob = b""
            shape = b""
            for d in b.shape:
                shape += pb.field_varint(_SHAPE_DIM, d)
            blob += pb.field_bytes(_BLOB_SHAPE, shape)
            blob += pb.field_packed_floats(_BLOB_DATA, b.ravel())
            layer += pb.field_bytes(_LAYER_BLOBS, blob)
        body += pb.field_bytes(_NET_LAYER, layer)
    with open(path, "wb") as f:
        f.write(body)


# ------------------------------------------------------------ fillers


def _expand_grouped_deconv(w: np.ndarray, cin: int, cout: int, group: int,
                           k: int) -> np.ndarray:
    """(cin, cout/group, k, k) grouped deconv weight → dense
    (cin, cout, k, k) with zeros off the group diagonal."""
    if group <= 1 or w.shape[1] == cout:  # already dense
        return w
    dense = np.zeros((cin, cout, k, k), np.float32)
    in_per, out_per = cin // group, cout // group
    for g in range(group):
        dense[g * in_per : (g + 1) * in_per,
              g * out_per : (g + 1) * out_per] = w[g * in_per : (g + 1) * in_per]
    return dense


def bilinear_kernel(k: int) -> np.ndarray:
    """Caffe's 'bilinear' weight filler (k, k)."""
    f = math.ceil(k / 2)
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    og = np.ogrid[:k, :k]
    return ((1 - abs(og[0] / f - c)) * (1 - abs(og[1] / f - c))).astype(np.float32)


# ------------------------------------------------------------ executor


class CaffeNet:
    """Executable caffe graph. forward(x_nhwc) is jittable; weights are
    a pytree argument so imported .caffemodel params swap in without
    recompiling."""

    POOL_MAX = {0, "MAX"}

    def __init__(
        self,
        prototxt: str,
        weights: Optional[Dict[str, List[np.ndarray]]] = None,
        seed: int = 0,
    ):
        if "\n" not in prototxt and prototxt.endswith((".prototxt", ".txt")):
            with open(prototxt) as f:
                prototxt = f.read()
        self.net = parse_prototxt(prototxt)
        self.name = self.net.get("name", "net")
        self.layers = [l for l in _as_list(self.net.get("layer"))]
        if not self.layers:
            raise ValueError("no 'layer' entries in prototxt")
        self.input_name = self.net.get("input", "data")
        dims = _as_list(self.net.get("input_dim")) or [1, 1, 512, 512]
        self.input_dim = tuple(int(d) for d in dims)  # NCHW in prototxt
        rng = np.random.RandomState(seed)
        self.params: Dict[str, List[np.ndarray]] = {}
        self._plan: List[Tuple[str, Any]] = []
        blob_channels = {self.input_name: self.input_dim[1]}
        for layer in self.layers:
            self._register(layer, weights or {}, rng, blob_channels)

    # -- weight materialization ---------------------------------------
    def _register(self, layer, weights, rng, chans):
        lt = layer["type"]
        name = layer["name"]
        bottoms = _as_list(layer.get("bottom"))
        cin = chans.get(bottoms[0]) if bottoms else None

        def filler(shape, spec):
            ftype = (spec or {}).get("type", "constant")
            if ftype == "msra":
                n = shape[0] * shape[2] * shape[3] if len(shape) == 4 else shape[0]
                # caffe MSRA default: fan_in = C_in*k*k
                fan_in = int(np.prod(shape[1:]))
                return rng.randn(*shape).astype(np.float32) * math.sqrt(2.0 / fan_in)
            if ftype == "bilinear":
                w = np.zeros(shape, np.float32)
                w[...] = bilinear_kernel(shape[-1])
                return w
            val = float((spec or {}).get("value", 0.0))
            return np.full(shape, val, np.float32)

        if lt == "Convolution":
            cp = layer["convolution_param"]
            cout = int(cp["num_output"])
            k = int(cp.get("kernel_size", 3))
            group = int(cp.get("group", 1))
            bias = bool(cp.get("bias_term", True))
            if name in weights:
                self.params[name] = [np.asarray(b, np.float32) for b in weights[name]]
            else:
                blobs = [filler((cout, cin // group, k, k), cp.get("weight_filler"))]
                if bias:
                    blobs.append(filler((cout,), cp.get("bias_filler")))
                self.params[name] = blobs
            chans[layer["top"]] = cout
        elif lt == "Deconvolution":
            cp = layer["convolution_param"]
            cout = int(cp["num_output"])
            k = int(cp.get("kernel_size", 4))
            group = int(cp.get("group", 1))
            bias = bool(cp.get("bias_term", True))
            if name in weights:
                blobs = [np.asarray(b, np.float32) for b in weights[name]]
            else:
                blobs = [filler((cin, cout // group, k, k), cp.get("weight_filler"))]
                if bias:
                    blobs.append(filler((cout,), cp.get("bias_filler")))
            # expand grouped weights to dense at load time so the
            # executor stays traceable (jit passes params as tracers)
            blobs[0] = _expand_grouped_deconv(blobs[0], cin, cout, group, k)
            self.params[name] = blobs
            chans[layer["top"]] = cout
        elif lt == "BatchNorm":
            c = cin
            if name in weights:
                self.params[name] = [np.asarray(b, np.float32) for b in weights[name]]
            else:
                self.params[name] = [
                    np.zeros(c, np.float32),
                    np.ones(c, np.float32),
                    np.ones(1, np.float32),
                ]
            chans[layer["top"]] = c
        elif lt == "Scale":
            c = cin
            bias = bool(layer.get("scale_param", {}).get("bias_term", True))
            if name in weights:
                self.params[name] = [np.asarray(b, np.float32) for b in weights[name]]
            else:
                self.params[name] = [np.ones(c, np.float32)] + (
                    [np.zeros(c, np.float32)] if bias else []
                )
            chans[layer["top"]] = c
        elif lt == "Concat":
            chans[layer["top"]] = sum(chans[b] for b in bottoms)
        elif lt in ("ReLU", "Eltwise", "Pooling", "Softmax", "Dropout", "Crop"):
            chans[layer["top"]] = cin
        elif lt == "Input":
            shape = layer.get("input_param", {}).get("shape", {})
            dims = [int(d) for d in _as_list(shape.get("dim"))]
            if dims:
                self.input_dim = tuple(dims)
            self.input_name = layer["top"]
            chans[layer["top"]] = self.input_dim[1]
            return
        else:
            raise NotImplementedError(f"caffe layer type {lt}")
        self._plan.append((name, layer))

    # -- execution ------------------------------------------------------
    def forward(self, params, x):
        """x: (b, h, w, c) NHWC → dict of all top blobs (incl. softmax)."""
        blobs: Dict[str, jax.Array] = {self.input_name: x}
        for name, layer in self._plan:
            lt = layer["type"]
            bots = _as_list(layer.get("bottom"))
            top = layer["top"]
            xin = blobs[bots[0]] if bots else None
            if lt == "Convolution":
                blobs[top] = self._conv(params[name], layer, xin)
            elif lt == "Deconvolution":
                blobs[top] = self._deconv(params[name], layer, xin)
            elif lt == "BatchNorm":
                mean, var, sf = params[name][0], params[name][1], params[name][2]
                s = jnp.where(sf[0] != 0, 1.0 / sf[0], 1.0)
                blobs[top] = (xin - mean * s) * jax.lax.rsqrt(var * s + 1e-5)
            elif lt == "Scale":
                p = params[name]
                y = xin * p[0]
                if len(p) > 1:
                    y = y + p[1]
                blobs[top] = y
            elif lt == "ReLU":
                blobs[top] = jnp.maximum(xin, 0)
            elif lt == "Pooling":
                blobs[top] = self._pool(layer, xin)
            elif lt == "Eltwise":
                op = layer.get("eltwise_param", {}).get("operation", "SUM")
                y = blobs[bots[0]]
                for b in bots[1:]:
                    if op == "PROD":
                        y = y * blobs[b]
                    elif op == "MAX":
                        y = jnp.maximum(y, blobs[b])
                    else:
                        y = y + blobs[b]
                blobs[top] = y
            elif lt == "Concat":
                blobs[top] = jnp.concatenate([blobs[b] for b in bots], axis=-1)
            elif lt == "Softmax":
                blobs[top] = jax.nn.softmax(xin, axis=-1)
            elif lt == "Dropout":
                blobs[top] = xin  # TEST phase
            elif lt == "Crop":
                ref = blobs[bots[1]]
                blobs[top] = xin[:, : ref.shape[1], : ref.shape[2], :]
        return blobs

    def _conv(self, p, layer, x):
        cp = layer["convolution_param"]
        stride = int(cp.get("stride", 1))
        pad = int(cp.get("pad", 0))
        dil = int(cp.get("dilation", 1))
        group = int(cp.get("group", 1))
        w = jnp.asarray(p[0]).transpose(2, 3, 1, 0)  # OIHW→HWIO
        y = jax.lax.conv_general_dilated(
            x,
            w,
            window_strides=(stride, stride),
            padding=[(pad, pad), (pad, pad)],
            rhs_dilation=(dil, dil),
            feature_group_count=group,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if len(p) > 1:
            y = y + p[1]
        return y

    def _deconv(self, p, layer, x):
        cp = layer["convolution_param"]
        stride = int(cp.get("stride", 2))
        pad = int(cp.get("pad", 1))
        k = int(cp.get("kernel_size", 4))
        wk = jnp.flip(jnp.asarray(p[0]).transpose(2, 3, 0, 1), (0, 1))  # HWIO
        pe = k - 1 - pad
        y = jax.lax.conv_general_dilated(
            x,
            wk,
            window_strides=(1, 1),
            padding=[(pe, pe), (pe, pe)],
            lhs_dilation=(stride, stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if len(p) > 1:
            y = y + p[1]
        return y

    @staticmethod
    def _pool(layer, x):
        pp = layer.get("pooling_param", {})
        k = int(pp.get("kernel_size", 3))
        s = int(pp.get("stride", 2))
        pad = int(pp.get("pad", 0))
        if pp.get("pool", "MAX") not in CaffeNet.POOL_MAX:
            raise NotImplementedError("only MAX pooling")
        h, w = x.shape[1], x.shape[2]

        def out_clip(d):
            o = math.ceil((d + 2 * pad - k) / s) + 1  # caffe ceil mode
            if pad and (o - 1) * s >= d + pad:  # caffe clip rule
                o -= 1
            return o

        oh, ow = out_clip(h), out_clip(w)
        pads = []
        for d, o in ((h, oh), (w, ow)):
            hi = (o - 1) * s + k - d - pad
            pads.append((pad, max(hi, 0)))
        return jax.lax.reduce_window(
            x,
            -jnp.inf,
            jax.lax.max,
            (1, k, k, 1),
            (1, s, s, 1),
            [(0, 0)] + pads + [(0, 0)],
        )

    def jit_forward(self, output: str = "softmax"):
        """Jitted (params, x) → output blob."""

        def f(params, x):
            return self.forward(params, x)[output]

        return jax.jit(f)
