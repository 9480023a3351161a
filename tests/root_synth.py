"""Spec-conformant ROOT-file synthesizer — the test oracle for the
native reader (ubresnet_tpu/cpp/rootio.cpp).

No ROOT is available in this environment (the reference's larcv stack
needs it, /root/reference/larcv* submodules are not even checked out),
so the reader is validated against files written here, following the
ROOT on-disk container format exactly:

  * TFile header (magic/version/fBEGIN/fEND + the remaining documented
    fields), records appended from fBEGIN.
  * Every record is a TKey: {fNbytes, fVersion, fObjlen, fDatime,
    fKeylen, fCycle, fSeekKey, fSeekPdir, class/name/title TStrings}.
    Freed slots are a negative fNbytes gap.
  * TBasket keys append {version, fBufferSize, fNevBufSize, fNevBuf,
    fLast, flag} inside the key; payload = entry data (+ the
    fEntryOffset WriteArray table when present).
  * Compression frames: 9-byte header {algo[2], method, u24le
    compressed, u24le uncompressed} + stream; zlib ("ZL") and zstd
    ("ZS", via libzstd through ctypes) supported, multi-frame allowed.
  * Object payloads: ROOT object-wise streaming — every object frame
    is {u32 bytecount|0x40000000, i16 version}; TStrings are u8-length
    (255 → u32) prefixed; STL vectors stream {frame, i32 n, elements}.

The larcv payloads cover both generations' layout variants (larcv1
LArbys/LArCV vs larcv2 DeepLearnPhysics — SURVEY.md §2.2): member
order _img/_meta in both orders, run/subrun/event as u64 or u32,
Point2D origin nested-frame or inline, EventBase with or without a
TObject header. larcv's ImageMeta origin is the image's TOP-LEFT
corner (min_x, max_y).
"""
from __future__ import annotations

import ctypes
import ctypes.util
import struct
import zlib

import numpy as np


def _tstring(s: str) -> bytes:
    b = s.encode()
    if len(b) < 255:
        return struct.pack(">B", len(b)) + b
    return struct.pack(">BI", 255, len(b)) + b


def frame(version: int, body: bytes, memberwise: bool = False) -> bytes:
    v = version | (0x4000 if memberwise else 0)
    return struct.pack(">IH", (len(body) + 2) | 0x40000000, v) + body


# ------------------------------------------------------------ larcv blobs


def stream_event_image2d(
    images,  # list of (np.ndarray row-major (rows, cols), meta dict)
    rse=(1, 0, 7),
    producer="wire",
    int_width=8,  # 8 (size_t, larcv2-ish) or 4
    img_first=True,  # Image2D member order: _img then _meta, or reverse
    nested_point=True,  # origin as a nested Point2D frame vs two doubles
    tobject_base=False,  # EventBase carries a TObject header (larcv1-ish)
    memberwise=False,  # stream the vector member-wise (kStreamedMemberWise)
) -> bytes:
    """One streamed EventImage2D entry blob.

    ``memberwise=True`` emits the ROOT member-wise STL layout
    (TBufferFile::WriteSTLMemberWise): the vector frame carries
    kStreamedMemberWise (0x4000) in its version, then
    {u16 element-class version, i32 n}, then the element class's data
    members streamed member-by-member — member A for all n elements
    consecutively, then member B for all n. Object-type members
    (vector<float> _img, ImageMeta _meta) keep their per-element
    frames inside each group.
    """
    ifmt = ">QQQ" if int_width == 8 else ">III"

    base = b""
    if tobject_base:
        base += struct.pack(">hII", 1, 0, 0x03000000)
    base += _tstring(producer)
    base += struct.pack(ifmt, *rse)
    base_f = frame(3, base)

    vec_f = stream_image_vector(
        images, int_width=int_width, img_first=img_first,
        nested_point=nested_point, memberwise=memberwise,
    )
    return frame(10, base_f + vec_f)


def stream_image_vector(
    images,
    int_width=8,
    img_first=True,
    nested_point=True,
    memberwise=False,
) -> bytes:
    """A streamed vector<Image2D> frame (the `_image_v` member) —
    object-wise or member-wise. Also the per-entry payload of a split
    tree's `_image_v` leaf branch."""
    ifmt = ">QQQ" if int_width == 8 else ">III"
    vfs, mfs, img_frames = [], [], b""
    for arr, meta in images:
        rows, cols = arr.shape
        # larcv stores column-major: _img[col*rows + row]
        colmajor = np.asarray(arr, np.float32).T.reshape(-1)
        vf = frame(6, struct.pack(">i", colmajor.size)
                   + colmajor.astype(">f4").tobytes())
        if nested_point:
            origin = frame(2, struct.pack(">dd", meta["ox"], meta["oy"]))
        else:
            origin = struct.pack(">dd", meta["ox"], meta["oy"])
        mf = frame(
            4,
            origin
            + struct.pack(">dd", meta["width"], meta["height"])
            + struct.pack(ifmt, rows, cols, meta.get("plane", 0)),
        )
        vfs.append(vf)
        mfs.append(mf)
        img_frames += frame(5, vf + mf if img_first else mf + vf)

    if memberwise:
        groups = (vfs, mfs) if img_first else (mfs, vfs)
        body = (
            struct.pack(">Hi", 5, len(images))  # elem class ver, count
            + b"".join(groups[0])
            + b"".join(groups[1])
        )
        return frame(6, body, memberwise=True)
    return frame(6, struct.pack(">i", len(images)) + img_frames)


# ------------------------------------------------------------- compression

_zstd = None


def _zstd_lib():
    global _zstd
    if _zstd is None:
        path = ctypes.util.find_library("zstd") or "libzstd.so.1"
        lib = ctypes.CDLL(path)
        lib.ZSTD_compress.restype = ctypes.c_size_t
        lib.ZSTD_compress.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int,
        ]
        lib.ZSTD_compressBound.restype = ctypes.c_size_t
        lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
        lib.ZSTD_isError.restype = ctypes.c_uint
        lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
        _zstd = lib
    return _zstd


def _zstd_compress(data: bytes) -> bytes:
    lib = _zstd_lib()
    cap = lib.ZSTD_compressBound(len(data))
    buf = ctypes.create_string_buffer(cap)
    n = lib.ZSTD_compress(buf, cap, data, len(data), 3)
    if lib.ZSTD_isError(n):
        raise RuntimeError("zstd compress failed")
    return buf.raw[:n]


_lz4 = None


def _lz4_lib():
    global _lz4
    if _lz4 is None:
        # runtime lib only on this image (no dev symlink) — stable ABI
        lib = ctypes.CDLL("liblz4.so.1")
        lib.LZ4_compress_default.restype = ctypes.c_int
        lib.LZ4_compress_default.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ]
        _lz4 = lib
    return _lz4


def _lz4_compress(data: bytes) -> bytes:
    lib = _lz4_lib()
    cap = len(data) + len(data) // 255 + 64
    buf = ctypes.create_string_buffer(cap)
    n = lib.LZ4_compress_default(data, buf, len(data), cap)
    assert n > 0, "LZ4_compress_default failed"
    return buf.raw[:n]


def compress_payload(data: bytes, algo: str, frame_size: int = 1 << 23) -> bytes:
    """ROOT compression framing: 9-byte header per frame."""
    if algo == "none":
        return data
    out = b""
    for i in range(0, len(data), frame_size):
        chunk = data[i : i + frame_size]
        if algo == "zlib":
            tag, comp = b"ZL", zlib.compress(chunk, 6)
        elif algo == "zstd":
            tag, comp = b"ZS", _zstd_compress(chunk)
        elif algo == "lz4":
            # ROOT R__zipLZ4 layout: XXH64 of the lz4 block (8 bytes,
            # the reader skips it) + the raw LZ4 block
            tag, comp = b"L4", b"\x00" * 8 + _lz4_compress(chunk)
        elif algo == "lzma":
            import lzma

            tag, comp = b"XZ", lzma.compress(chunk,
                                             format=lzma.FORMAT_XZ)
        else:
            raise ValueError(algo)
        out += (
            tag
            + struct.pack("<B", 8)
            + struct.pack("<I", len(comp))[:3]
            + struct.pack("<I", len(chunk))[:3]
            + comp
        )
    return out


# -------------------------------------------------------------- the writer


class RootFileWriter:
    """Minimal spec-conformant ROOT file: header + TKey records."""

    HEADER_LEN = 100

    def __init__(self, path: str, compression: str = "zlib",
                 frame_size: int = 1 << 23):
        self.path = path
        self.compression = compression
        self.frame_size = frame_size
        self.records: list[bytes] = []
        self._pos = self.HEADER_LEN
        # first record of a real file is the TFile directory record
        self.add_record("TFile", "synth.root", "", b"\x00" * 40,
                        compress=False)

    def _key(self, cls: str, name: str, title: str, objlen: int,
             payload_len: int, seek: int, extra: bytes = b"") -> bytes:
        strings = _tstring(cls) + _tstring(name) + _tstring(title)
        # fKeylen counts the whole key record incl. the fNbytes word
        keylen = 4 + 2 + 4 + 4 + 2 + 2 + 4 + 4 + len(strings) + len(extra)
        nbytes = keylen + payload_len
        return (
            struct.pack(">ihIIhh", nbytes, 4, objlen, 0, keylen, 1)
            + struct.pack(">ii", seek, self.HEADER_LEN)
            + strings
            + extra
        ), keylen

    def add_record(self, cls: str, name: str, title: str, obj: bytes,
                   compress: bool | None = None, extra: bytes = b"") -> int:
        algo = self.compression if (compress is None or compress) else "none"
        payload = compress_payload(obj, algo, self.frame_size)
        if len(payload) >= len(obj):
            algo, payload = "none", obj
        key, _ = self._key(cls, name, title, len(obj), len(payload),
                           self._pos, extra)
        rec = key + payload
        self.records.append(rec)
        seek = self._pos
        self._pos += len(rec)
        return seek

    def add_gap(self, nbytes: int):
        """A freed slot: negative fNbytes, junk body."""
        rec = struct.pack(">i", -nbytes) + b"\xaa" * (nbytes - 4)
        self.records.append(rec)
        self._pos += nbytes

    def add_basket(self, tree: str, branch: str, entries: list[bytes],
                   fixed_size: bool = False, compress: bool | None = None):
        """One TBasket holding `entries` blobs for branch@tree."""
        data = b"".join(entries)
        if fixed_size:
            sizes = {len(e) for e in entries}
            assert len(sizes) == 1, "fixed-size basket needs equal blobs"
            nevbufsize = sizes.pop()
            obj = data
        else:
            nevbufsize = 1  # ROOT keeps a nonzero hint; offsets rule
            obj = data

        # fKeylen must be known to build fLast and the offsets table:
        # compute with a dry key.
        extra_probe = struct.pack(">hiiii", 3, 32000, 0, 0, 0) + b"\x00"
        _, keylen = self._key("TBasket", branch, tree, 0, 0, 0, extra_probe)

        flast = keylen + len(data)
        if not fixed_size:
            offs, acc = [], keylen
            for e in entries:
                offs.append(acc)
                acc += len(e)
            obj = data + struct.pack(">i", len(entries)) + struct.pack(
                ">%di" % len(entries), *offs)
        extra = struct.pack(
            ">hiiii", 3, 32000,
            nevbufsize if fixed_size else 0,
            len(entries), flast,
        ) + b"\x00"
        self.add_record("TBasket", branch, tree, obj, compress=compress,
                        extra=extra)

    def close(self):
        body = b"".join(self.records)
        fend = self.HEADER_LEN + len(body)
        header = (
            b"root"
            + struct.pack(">ii", 62804, self.HEADER_LEN)
            + struct.pack(">iiiii", fend, 0, 0, 0, 40)
            + struct.pack(">Bi", 4, 101)
            + struct.pack(">ii", 0, 0)
        )
        header += b"\x00" * (self.HEADER_LEN - len(header))
        with open(self.path, "wb") as f:
            f.write(header + body)


def write_larcv_like(
    path: str,
    producers=("wire", "segment"),
    n_entries: int = 5,
    rows: int = 24,
    cols: int = 16,
    planes=(2,),
    compression: str = "zlib",
    frame_size: int = 1 << 23,
    entries_per_basket: int = 2,
    seed: int = 0,
    split=False,  # split tree: per-member leaf branches
    **stream_kw,
):
    """A synthetic larcv-style file: one image2d tree per producer
    (tree `image2d_{p}_tree`, branch `image2d_{p}_branch`), images
    with physical metas, multiple baskets per branch, plus decoy
    records (TTree metadata stub, StreamerInfo, a freed gap) that the
    reader must skip. Returns the truth {producer: [(arrays, metas,
    rse) per entry]}.

    ``split=True`` writes the tree split one level (ROOT splitlevel>0
    on an EventImage2D branch): each EventBase member gets its own
    leaf branch — `<branch>._run/._subrun/._event` as raw big-endian
    fixed-size ints, `._producer` as a TString — and the image vector
    streams per entry into `<branch>._image_v` as a bare
    vector<Image2D> frame (object-wise or member-wise per
    ``stream_kw``)."""
    rng = np.random.RandomState(seed)
    w = RootFileWriter(path, compression=compression, frame_size=frame_size)
    # decoy records a real file would carry
    w.add_record("TTree", "image2d_%s_tree" % producers[0], "tree stub",
                 rng.bytes(600))
    w.add_record("TList", "StreamerInfo", "Doubly linked list",
                 rng.bytes(300))
    truth = {}
    for pi, prod in enumerate(producers):
        per_entry = []
        blobs = []
        for e in range(n_entries):
            imgs, metas = [], []
            for plane in planes:
                arr = (rng.rand(rows, cols) * 100).astype(np.float32)
                meta = {
                    "ox": 100.0 * plane,
                    "oy": 6048.0 + e,  # top-left: (min_x, max_y)
                    "width": cols * 0.3,
                    "height": rows * 6.0,
                    "plane": plane,
                }
                imgs.append((arr, meta))
                metas.append(meta)
            rse = (10, 1, 100 + e)  # shared across producers, like larcv
            blobs.append(
                stream_event_image2d(imgs, rse=rse, producer=prod,
                                     **stream_kw))
            per_entry.append(([a for a, _ in imgs], metas, rse))
        truth[prod] = per_entry
        tree = "image2d_%s_tree" % prod
        branch = "image2d_%s_branch" % prod
        if split:
            intw = stream_kw.get("int_width", 8)
            ifmt = ">Q" if intw == 8 else ">I"
            vec_kw = {
                k: v for k, v in stream_kw.items()
                if k in ("int_width", "img_first", "nested_point",
                         "memberwise")
            }
            leaves = {
                "._image_v": [
                    stream_image_vector(
                        list(zip(arrs, metas)), **vec_kw
                    )
                    for arrs, metas, _ in per_entry
                ],
                "._producer": [_tstring(prod)] * n_entries,
                "._run": [struct.pack(ifmt, r) for _, _, (r, s, e)
                          in per_entry],
                "._subrun": [struct.pack(ifmt, s) for _, _, (r, s, e)
                             in per_entry],
                "._event": [struct.pack(ifmt, e) for _, _, (r, s, e)
                            in per_entry],
            }
            for leaf, entries in leaves.items():
                fixed = leaf in ("._run", "._subrun", "._event")
                for i in range(0, n_entries, entries_per_basket):
                    w.add_basket(tree, branch + leaf,
                                 entries[i : i + entries_per_basket],
                                 fixed_size=fixed)
        else:
            for i in range(0, n_entries, entries_per_basket):
                w.add_basket(tree, branch,
                             blobs[i : i + entries_per_basket])
        if pi == 0:
            w.add_gap(64)  # freed slot between branches
    w.close()
    return truth
