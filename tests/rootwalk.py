"""Independent ROOT TFile/TTree/TBasket byte-walker (pure Python).

Validation oracle for the native writer in ubresnet_tpu/cpp/rootio.cpp
(VERDICT round-3 item 5): the repo's own C++ reader shares format
tables with the writer, so a writer bug could be masked by a matching
reader bug. This module re-derives the on-disk ROOT container format
from scratch — struct-based, big-endian, no imports from ubresnet_tpu
— and *checks conformance* at every step instead of tolerating it:

  * TFile 100-byte header (magic, fVersion, fBEGIN, fEND, fNbytesName,
    fUnits, fCompress) — reference capability: files consumed by
    downstream larcv tooling (IOManager kWRITE,
    /root/reference/deploy/run_ubresnet_precropped.py:93-95,159-173).
  * Sequential TKey walk fBEGIN→fEND with self-consistency asserts:
    fSeekKey equals the record's actual offset, fKeylen equals the
    re-computed header size, class/name/title TStrings fit exactly,
    records tile the file with no gaps or overlaps.
  * Compression frames: 9-byte header {algo[2], method u8,
    compressed u24le, uncompressed u24le}; zlib ("ZL") and zstd ("ZS");
    concatenated inflated size must equal the key's fObjlen.
  * TBasket extra members {version, fBufferSize, fNevBufSize, fNevBuf,
    fLast} + the trailing fEntryOffset table: offsets ascending,
    first == fKeylen, fLast == fKeylen + data bytes.
  * larcv2-layout EventImage2D object decode (version-framed:
    EventBase{producer, run/subrun/event u64} + vector<Image2D>, each
    {vector<float> column-major pixels, ImageMeta{origin Point2D,
    width, height, rows, cols, plane}}), byte counts checked exactly.
  * TTree stub entry counts cross-checked against the per-branch sum
    of basket fNevBuf.

Anything off-spec raises ConformanceError with the file offset.
"""
from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass, field


class ConformanceError(AssertionError):
    pass


def _need(cond, off, msg):
    if not cond:
        raise ConformanceError(f"@0x{off:x}: {msg}")


class _Cur:
    """Big-endian cursor over bytes with absolute-offset errors."""

    def __init__(self, data: bytes, pos: int = 0, base: int = 0):
        self.d = data
        self.p = pos
        self.base = base  # file offset of data[0], for messages

    @property
    def off(self):
        return self.base + self.p

    def take(self, n):
        _need(self.p + n <= len(self.d), self.off,
              f"truncated: wanted {n} bytes, have {len(self.d) - self.p}")
        b = self.d[self.p:self.p + n]
        self.p += n
        return b

    def u8(self):
        return self.take(1)[0]

    def u16(self):
        return struct.unpack(">H", self.take(2))[0]

    def i32(self):
        return struct.unpack(">i", self.take(4))[0]

    def u32(self):
        return struct.unpack(">I", self.take(4))[0]

    def u64(self):
        return struct.unpack(">Q", self.take(8))[0]

    def f32(self):
        return struct.unpack(">f", self.take(4))[0]

    def f64(self):
        return struct.unpack(">d", self.take(8))[0]

    def tstring(self):
        n = self.u8()
        if n == 255:
            n = self.u32()
        return self.take(n).decode("ascii")


@dataclass
class Key:
    seek: int
    nbytes: int
    objlen: int
    keylen: int
    cycle: int
    cls: str
    name: str
    title: str
    extra: bytes      # key bytes after the three TStrings
    payload: bytes    # raw on-disk payload (maybe compressed)

    @property
    def data(self) -> bytes:
        """Decompressed object bytes, length-checked against fObjlen."""
        if len(self.payload) == self.objlen:
            return self.payload
        out, c = [], _Cur(self.payload, base=self.seek + self.keylen)
        while c.p < len(self.payload):
            algo = c.take(2)
            method = c.u8()
            comp = c.u8() | (c.u8() << 8) | (c.u8() << 16)
            ucmp = c.u8() | (c.u8() << 8) | (c.u8() << 16)
            frame = c.take(comp)
            if algo == b"ZL":
                _need(method == 8, c.off, f"zlib method {method} != 8")
                raw = zlib.decompress(frame)
            elif algo == b"ZS":
                import zstandard  # only if a file actually uses zstd

                raw = zstandard.ZstdDecompressor().decompress(frame)
            else:
                raise ConformanceError(
                    f"@0x{c.off:x}: unknown compression tag {algo!r}")
            _need(len(raw) == ucmp, c.off,
                  f"frame inflated to {len(raw)}, header said {ucmp}")
            out.append(raw)
        data = b"".join(out)
        _need(len(data) == self.objlen, self.seek,
              f"object inflated to {len(data)}, fObjlen {self.objlen}")
        return data


@dataclass
class Basket:
    key: Key
    nev_buf_size: int
    nev_buf: int
    last: int
    entries: list = field(default_factory=list)  # per-entry bytes


@dataclass
class Image:
    rows: int
    cols: int
    plane: int
    origin_x: float
    origin_y: float
    width: float
    height: float
    pixels: list  # row-major list of rows, each a list of floats


@dataclass
class Event:
    producer: str
    run: int
    subrun: int
    event: int
    images: list


def walk_keys(data: bytes):
    """Parse the header and yield every TKey record, checking that the
    records exactly tile [fBEGIN, fEND)."""
    _need(data[:4] == b"root", 0, f"bad magic {data[:4]!r}")
    h = _Cur(data, 4)
    version = h.i32()
    begin = h.i32()
    _need(version < 1000000, 4, "large-file (64-bit seek) header "
          "unsupported by this walker")
    end = h.i32()
    h.i32()  # fSeekFree
    h.i32()  # fNbytesFree
    h.i32()  # nfree
    nbytes_name = h.i32()
    units = h.u8()
    compress = h.i32()
    hdr = {"version": version, "begin": begin, "end": end,
           "nbytes_name": nbytes_name, "units": units,
           "compress": compress}
    _need(begin >= 64 and begin <= len(data), 8, f"fBEGIN {begin}")
    _need(end <= len(data), 12, f"fEND {end} > file size {len(data)}")

    keys = []
    pos = begin
    while pos < end:
        c = _Cur(data, pos)
        nbytes = c.i32()
        if nbytes < 0:  # freed slot
            pos += -nbytes
            continue
        _need(nbytes > 0, pos, "zero-length record")
        kver = c.u16()
        objlen = c.u32()
        c.u32()  # fDatime
        keylen = c.u16()
        cycle = c.u16()
        _need(kver < 1000, pos, "64-bit-seek key unsupported here")
        seek_key = c.i32()
        seek_pdir = c.i32()
        cls = c.tstring()
        name = c.tstring()
        title = c.tstring()
        _need(seek_key == pos, pos,
              f"fSeekKey {seek_key} != record offset {pos}")
        _need(c.p - pos <= keylen, pos,
              f"strings overrun fKeylen ({c.p - pos} > {keylen})")
        extra = data[c.p:pos + keylen]
        payload = data[pos + keylen:pos + nbytes]
        _need(pos + nbytes <= end, pos, "record overruns fEND")
        if pos != begin:  # the first record IS the directory
            _need(seek_pdir == begin, pos,
                  f"fSeekPdir {seek_pdir} != fBEGIN {begin}")
        keys.append(Key(pos, nbytes, objlen, keylen, cycle,
                        cls, name, title, extra, payload))
        pos += nbytes
    _need(pos == end, pos, f"records do not tile to fEND ({pos} != {end})")
    return hdr, keys


def parse_basket(key: Key) -> Basket:
    """Check the TBasket key extras + entry-offset table and slice the
    decompressed object into per-entry byte blobs."""
    c = _Cur(key.extra, base=key.seek)
    c.u16()  # basket version
    c.i32()  # fBufferSize
    nev_buf_size = c.i32()
    nev_buf = c.i32()
    last = c.i32()
    data = key.data
    border = last - key.keylen
    _need(0 <= border <= len(data), key.seek,
          f"fLast {last} out of object range")
    entries = []
    if key.objlen > border:
        # trailing fEntryOffset table: {i32 n, n × absolute offsets}
        t = _Cur(data, border, base=key.seek + key.keylen)
        n = t.i32()
        _need(n == nev_buf, key.seek,
              f"offset-table n {n} != fNevBuf {nev_buf}")
        offs = [t.i32() for _ in range(n)]
        _need(t.p == len(data), key.seek,
              "bytes after the entry-offset table")
        _need(offs[0] == key.keylen, key.seek,
              f"first entry offset {offs[0]} != fKeylen {key.keylen}")
        bounds = offs + [last]
        for a, b in zip(bounds, bounds[1:]):
            _need(key.keylen <= a <= b <= last, key.seek,
                  f"entry bounds [{a},{b}) outside basket")
            entries.append(data[a - key.keylen:b - key.keylen])
    else:
        _need(nev_buf_size > 0 and border == nev_buf * nev_buf_size,
              key.seek, "fixed-size basket geometry mismatch")
        for i in range(nev_buf):
            entries.append(data[i * nev_buf_size:(i + 1) * nev_buf_size])
    return Basket(key, nev_buf_size, nev_buf, last, entries)


def _frame(c: _Cur):
    """Version frame {u32 bytecount|0x40000000, u16 version} → (version,
    absolute end position in c)."""
    bc = c.u32()
    _need(bc & 0x40000000, c.off - 4, f"missing bytecount bit (0x{bc:x})")
    body = bc & ~0x40000000
    end = c.p + body
    ver = c.u16()
    return ver, end


def decode_event_image2d(blob: bytes, base_off: int = 0) -> Event:
    """Decode one object-wise larcv2-layout EventImage2D blob, checking
    every frame's byte count exactly."""
    c = _Cur(blob, base=base_off)
    _, ev_end = _frame(c)
    # EventBase: producer + run/subrun/event
    _, base_end = _frame(c)
    producer = c.tstring()
    run, subrun, event = c.u64(), c.u64(), c.u64()
    _need(c.p == base_end, c.off, "EventBase frame length mismatch")
    # vector<Image2D>
    _, vec_end = _frame(c)
    nimg = c.i32()
    _need(0 <= nimg < 10000, c.off, f"implausible image count {nimg}")
    images = []
    for _ in range(nimg):
        _, img_end = _frame(c)
        # vector<float> _img (column-major)
        _, px_end = _frame(c)
        npx = c.i32()
        _need(c.p + 4 * npx == px_end, c.off,
              f"pixel vector frame != 4*{npx} bytes")
        flat = struct.unpack(f">{npx}f", c.take(4 * npx))
        # ImageMeta
        _, meta_end = _frame(c)
        _, origin_end = _frame(c)
        ox, oy = c.f64(), c.f64()
        _need(c.p == origin_end, c.off, "Point2D frame length mismatch")
        width, height = c.f64(), c.f64()
        rows, cols, plane = c.u64(), c.u64(), c.u64()
        _need(c.p == meta_end, c.off, "ImageMeta frame length mismatch")
        _need(c.p == img_end, c.off, "Image2D frame length mismatch")
        _need(rows * cols == npx, c.off,
              f"rows*cols {rows}*{cols} != npixels {npx}")
        pixels = [[flat[col * rows + row] for col in range(cols)]
                  for row in range(rows)]
        images.append(Image(rows, cols, plane, ox, oy, width, height,
                            pixels))
    _need(c.p == vec_end, c.off, "vector frame length mismatch")
    _need(c.p == ev_end, c.off, "event frame length mismatch")
    _need(c.p == len(blob), c.off, "trailing bytes after event object")
    return Event(producer, run, subrun, event, images)


def walk_file(path: str) -> dict:
    """Full conformance walk. Returns
    {"header": ..., "keys": [...], "trees": {tree: {"entries": n,
    "events": [Event, ...]}}} — events in basket order."""
    with open(path, "rb") as f:
        data = f.read()
    hdr, keys = walk_keys(data)
    trees = {}
    stub_counts = {}
    for k in keys:
        if k.cls == "TBasket":
            bk = parse_basket(k)
            t = trees.setdefault(k.title, {"entries": 0, "events": []})
            t["entries"] += bk.nev_buf
            for e in bk.entries:
                t["events"].append(
                    decode_event_image2d(e, base_off=k.seek + k.keylen))
        elif k.cls == "TTree":
            body = k.data
            _need(len(body) >= 8, k.seek, "TTree stub body too short")
            stub_counts[k.name] = struct.unpack(">Q", body[:8])[0]
    for tree, n in stub_counts.items():
        got = trees.get(tree, {"entries": 0})["entries"]
        _need(got == n, 0,
              f"TTree {tree} claims {n} entries, baskets hold {got}")
    return {"header": hdr, "keys": keys, "trees": trees}
