"""Precropped inference — batched scoring of event files.

Capability parity with deploy/run_ubresnet_precropped.py:115-194 (read
precropped ADC images for one plane, forward, write per-class score
images to producer ``uburn_plane%d`` carrying the original meta and
run/subrun/event id) with the reference's two defects fixed as intent
(SURVEY.md §7): batches actually fill to batch_size (the reference
loops one event at a time regardless of -b, ln 136-138), and the whole
batch is one device dispatch.

Keeps the reference's per-stage cumulative timing dict report
(ln 97-103,192-194) so numbers stay comparable.
"""
from __future__ import annotations

import time
from collections import OrderedDict
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ubresnet_tpu.data.meta import Image2D
from ubresnet_tpu.data.uevt import EventFileWriter


class PrecroppedRunner:
    def __init__(
        self,
        model,
        variables,
        batch_size: int = 8,
        adc_threshold: Optional[float] = None,
        sparse: bool = True,
        sparse_bucket: int = 4096,
        compact_readback=False,
        readback_dilate: int = 4,
        score_dtype=np.float32,
        data_mesh=None,
    ):
        self.model = model
        self.variables = variables
        self.batch_size = batch_size
        self.adc_threshold = adc_threshold
        self.sparse = sparse
        self.sparse_bucket = sparse_bucket
        # compact_readback: False (full f32 scores), True/'f16' (drop
        # the last class + ship f16 — 6x fewer D2H bytes, ~5e-4 score
        # quantisation), 'u8' (drop last class + 255-level fixed
        # point — 12x fewer bytes, ~2e-3 quantisation), or 'sparse'
        # (u8 scores gathered on-device at charge pixels + a
        # readback_dilate halo only; empty pixels reconstructed on the
        # host from the network's zero-input response field — another
        # ~20-60x fewer bytes at LArTPC occupancy). D2H readback
        # dominates the deploy wall when host<->device bandwidth is
        # the bottleneck, so the encoding IS the throughput dial.
        if compact_readback is True:
            compact_readback = "f16"
        if compact_readback == "sparse" and not sparse:
            raise ValueError("compact_readback='sparse' requires sparse=True")
        if compact_readback == "sparse":
            import warnings

            # The out-of-halo fill is only valid for TRAINED networks
            # whose scores decay to the zero-input response away from
            # charge — measured 0.667 max deviation on random-init
            # weights (bench deploy section reports the number per
            # run, docs/roofline.md round 5).
            warnings.warn(
                "compact_readback='sparse' reconstructs pixels outside "
                f"the r={readback_dilate} readback halo from the "
                "network's zero-input response; valid only when the "
                "trained network's scores decay within that halo. The "
                "bench deploy section measures max |sparse - u8| for "
                "your weights.",
                stacklevel=2,
            )
        self.compact = compact_readback
        self.readback_dilate = readback_dilate
        self._out_cap = 0
        self._bg_fields = {}
        # data_mesh: a jax.sharding.Mesh → each dispatched batch is
        # sharded over every mesh device on the batch axis (GSPMD
        # data-parallel inference — pod-slice deploy; the reference has
        # no multi-device deploy at all). batch_size must divide by the
        # device count so shards stay equal (tail batches are already
        # zero-padded to batch_size).
        self.data_mesh = data_mesh
        self._batch_sh = self._coo_sh = None
        if data_mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            ndev = int(np.prod(list(data_mesh.shape.values())))
            if batch_size % ndev:
                raise ValueError(
                    f"batch_size ({batch_size}) must be divisible by "
                    f"the mesh device count ({ndev})"
                )
            axes = tuple(data_mesh.axis_names)
            self._batch_sh = NamedSharding(
                data_mesh, P(axes, None, None, None)
            )
            self._coo_sh = NamedSharding(data_mesh, P(axes, None))
        # np.float16 halves written score bytes (~5e-4 quantisation on
        # probabilities, same loss as the compact D2H form); the .root
        # writer path always stores f32 (larcv Image2D is float)
        self.score_dtype = np.dtype(score_dtype)
        self._cap = 0

        def _post(probs):
            # compact D2H form: drop the last class (host reconstructs
            # it as 1-sum — softmax rows sum to 1) and ship f16 or u8
            # fixed point.
            if compact_readback == "u8":
                return jnp.round(
                    probs[..., :-1] * 255.0).astype(jnp.uint8)
            if compact_readback and compact_readback != "sparse":
                return probs[..., :-1].astype(jnp.float16)
            return probs

        self._fwd = jax.jit(lambda v, x: _post(jnp.exp(model.apply(v, x))))
        if sparse:
            from ubresnet_tpu.ops.sparse import sparse_forward_fn

            self._fwd_sparse = sparse_forward_fn(model, post=_post)
        if compact_readback == "sparse":
            from ubresnet_tpu.ops.sparse import sparse_gather_forward_fn

            self._fwd_gather = sparse_gather_forward_fn(model)

    def _dispatch(self, batch: np.ndarray) -> jax.Array:
        """(b, h, w, 1) host batch → device (b, h, w, c) probabilities,
        dispatched asynchronously (no readback — JAX returns a future;
        the caller overlaps the next read/previous write with compute).

        Sparse mode ships COO nonzeros and densifies on-device
        (ops/sparse.py) — the H2D bytes drop ~50x on zero-suppressed
        images. Capacity is sticky so the program compiles once.
        """
        if self.adc_threshold:
            batch = np.where(batch < self.adc_threshold, 0.0, batch)
        if not self.sparse:
            x = (jnp.asarray(batch) if self._batch_sh is None
                 else jax.device_put(batch, self._batch_sh))
            return self._fwd(self.variables, x)
        from ubresnet_tpu.ops.sparse import sparsify

        sp = sparsify(batch[..., 0], bucket=self.sparse_bucket)
        k = sp["indices"].shape[1]
        self._cap = max(self._cap, k)
        if k < self._cap:
            pad = self._cap - k
            sp["indices"] = np.pad(sp["indices"], ((0, 0), (0, pad)))
            sp["values"] = np.pad(sp["values"], ((0, 0), (0, pad)))
        idx_dev = jax.device_put(sp["indices"], self._coo_sh)
        val_dev = jax.device_put(sp["values"], self._coo_sh)
        if self.compact == "sparse":
            from ubresnet_tpu.ops.sparse import dilate_mask, mask_indices

            halo = dilate_mask(batch[..., 0] != 0.0, self.readback_dilate)
            out_idx = mask_indices(halo, bucket=self.sparse_bucket)
            ko = out_idx.shape[1]
            self._out_cap = max(self._out_cap, ko)
            if ko < self._out_cap:
                # pad with the -1 sentinel, NOT 0: index 0 is flat
                # pixel (0,0) and zero-padded slots would overwrite its
                # background fill on the host paste
                out_idx = np.pad(
                    out_idx, ((0, 0), (0, self._out_cap - ko)),
                    constant_values=-1,
                )
            dev = self._fwd_gather(
                self.variables,
                idx_dev,
                val_dev,
                jax.device_put(out_idx, self._coo_sh),
                batch.shape[1:3],
            )
            return dev, out_idx
        return self._fwd_sparse(
            self.variables, idx_dev, val_dev, batch.shape[1:3]
        )

    def calibrate_from(
        self,
        input_file: str,
        plane: int = 2,
        producer: str = "wire",
        n_images: int = 32,
        percentile: float = None,
    ) -> int:
        """int8 PTQ calibration (ops/quant.py) from the first
        ``n_images`` of the input itself — the deploy-time analog of
        bench.py's int8 section. Requires the runner's model policy to
        have ``quant_eval=True`` (``Policy.tpu_int8()``); updates
        ``self.variables`` with the calibrated 'quant' collection.
        ``percentile``: outlier-robust scale statistic (see
        ops/quant.calibrate). Returns the number of images used."""
        from ubresnet_tpu.data.rootio import open_event_file
        from ubresnet_tpu.ops.quant import calibrate

        reader = open_event_file(input_file)
        images = []
        for i in range(min(n_images, len(reader))):
            ev = reader.read_entry(i, producers=[producer])
            imgs = ev[producer]
            sel = [im for im in imgs if im.meta.plane == plane] or imgs
            px = sel[0].pixels
            if self.adc_threshold:
                px = np.where(px < self.adc_threshold, 0.0, px)
            images.append(px)
        if not images:
            raise ValueError(f"no '{producer}' images in {input_file}")
        batch = np.stack(images)[..., None].astype(np.float32)
        self.variables = calibrate(
            self.model, self.variables, [batch], percentile=percentile
        )
        self._bg_fields.clear()  # zero-input field depends on variables
        return len(images)

    def _fetch(self, dev: jax.Array) -> np.ndarray:
        """Device scores → host (b, h, w, c) float32 probabilities.

        Reads back in ~8 MB batch-slices (measured: chunked D2H
        sustains ~3x the single-transfer rate through the axon tunnel)
        and, in compact mode, reconstructs the dropped last class as
        1 - sum(others).
        """
        per_crop = int(np.prod(dev.shape[1:])) * dev.dtype.itemsize
        step = max(1, (8 << 20) // max(per_crop, 1))
        parts = [
            np.asarray(jax.device_get(dev[i : i + step]))
            for i in range(0, dev.shape[0], step)
        ]
        out = np.concatenate(parts) if len(parts) > 1 else parts[0]
        if self.compact:
            out = out.astype(np.float32)
            if self.compact == "u8":
                out *= 1.0 / 255.0
            rest = np.clip(1.0 - out.sum(axis=-1, keepdims=True), 0.0, 1.0)
            out = np.concatenate([out, rest], axis=-1)
        return out

    def _bg_field(self, hw) -> np.ndarray:
        """Network response to an all-zero input at this shape — a
        single (h, w, c) field (depends only on pixel position via
        padding boundary effects), computed once per shape and used as
        the host-side fill for pixels outside the sparse-readback
        halo."""
        if hw not in self._bg_fields:
            h, w = hw
            z = jnp.zeros((1, h, w, 1), jnp.float32)
            probs = jax.jit(
                lambda v, x: jnp.exp(self.model.apply(v, x))
            )(self.variables, z)
            self._bg_fields[hw] = np.asarray(jax.device_get(probs))[0]
        return self._bg_fields[hw]

    def _fetch_sparse(self, dev, out_idx: np.ndarray, hw) -> np.ndarray:
        """Gathered (b, K, c-1) u8 device scores + host indices → dense
        (b, h, w, c) float32 probabilities over the zero-input field.

        Pad slots carry the -1 sentinel (ops/sparse.mask_indices and
        the capacity pad in _dispatch) and are dropped here — pasting
        them would overwrite flat pixel 0 with garbage."""
        g = np.asarray(jax.device_get(dev)).astype(np.float32)
        g *= 1.0 / 255.0
        rest = np.clip(1.0 - g.sum(axis=-1, keepdims=True), 0.0, 1.0)
        vals = np.concatenate([g, rest], axis=-1)
        bg = self._bg_field(hw)
        b = g.shape[0]
        out = np.broadcast_to(bg, (b,) + bg.shape).reshape(
            b, -1, bg.shape[-1]
        ).copy()
        idx = out_idx[:b]
        rows, slots = np.nonzero(idx >= 0)
        out[rows, idx[rows, slots]] = vals[rows, slots]
        return out.reshape((b,) + bg.shape)

    def _forward(self, batch: np.ndarray) -> np.ndarray:
        dev = self._dispatch(batch)
        if isinstance(dev, tuple):
            return self._fetch_sparse(dev[0], dev[1], batch.shape[1:3])
        return self._fetch(dev)

    def run(
        self,
        input_file: str,
        output_file: str,
        plane: int = 2,
        producer: str = "wire",
        out_producer: Optional[str] = None,
        n_entries: Optional[int] = None,
        verbose: bool = False,
    ) -> OrderedDict:
        timing = OrderedDict(
            [("total", 0.0), ("read", 0.0), ("forward", 0.0), ("write", 0.0)]
        )
        t_total = time.time()
        # .uevt or larcv .root input, sniffed by magic — the reference
        # deploy reads larcv ROOT directly (run_ubresnet_precropped.py:83-84)
        from ubresnet_tpu.data.rootio import open_event_file

        reader = open_event_file(input_file)
        if output_file.endswith(".root"):
            # write-back path: scores flow to larcv consumers (reference
            # IOManager(kWRITE), run_ubresnet_precropped.py:93-95)
            from ubresnet_tpu.data.rootio import RootWriter

            writer = RootWriter(output_file)
            # RootWriter stores float32 (larcv Image2D is float);
            # the f16 score option applies to .uevt outputs only
            out_dt = np.dtype(np.float32)
        else:
            writer = EventFileWriter(output_file)
            out_dt = self.score_dtype
        out_producer = out_producer or f"uburn_plane{plane}"
        n = len(reader) if n_entries is None else min(n_entries, len(reader))

        # entries decoded during the sparse pre-scan are kept for the
        # batch loop (bounded budget) so each basket/blob is decoded
        # once, not twice — matters for compressed .root inputs
        prefetched = {}
        if self.sparse and n:
            # pre-scan the run's max per-image occupancy so ONE sparse
            # capacity (and therefore one compiled program) serves
            # every batch — mid-run capacity growth forced a recompile
            # per growth step
            t0 = time.time()
            from ubresnet_tpu.ops.sparse import round_capacity

            budget = 1 << 29  # ~512 MB of cached pixels
            cached_bytes = 0
            max_nnz = 1
            max_halo = 1
            for i in range(n):
                ev = reader.read_entry(i, producers=[producer])
                imgs = ev[producer]
                sel = [im for im in imgs if im.meta.plane == plane] or imgs
                px = sel[0].pixels
                if self.adc_threshold:
                    mask = px >= self.adc_threshold
                else:
                    mask = px != 0
                max_nnz = max(max_nnz, int(mask.sum()))
                if self.compact == "sparse":
                    from ubresnet_tpu.ops.sparse import dilate_mask

                    max_halo = max(
                        max_halo,
                        int(dilate_mask(
                            mask[None], self.readback_dilate).sum()),
                    )
                if cached_bytes < budget:
                    prefetched[i] = sel[0]
                    cached_bytes += px.nbytes
            self._cap = round_capacity(max_nnz, self.sparse_bucket)
            if self.compact == "sparse":
                self._out_cap = round_capacity(max_halo, self.sparse_bucket)
            timing["read"] += time.time() - t0

        # one-deep software pipeline: dispatch batch k asynchronously,
        # then write batch k-1 and read batch k+1 while the device
        # computes (VERDICT round-2 item 8 — the batch-at-a-time loop
        # left the chip idle during host read/write). File writes run
        # on a dedicated worker thread (sole owner of `writer`) so the
        # host<->device readback — the serial resource when D2H
        # bandwidth binds — overlaps the file IO of the previous batch.
        import queue as _queue
        import threading

        write_q: "_queue.Queue" = _queue.Queue(maxsize=2)
        write_err = []

        def _write_worker():
            while True:
                item = write_q.get()
                if item is None:
                    return
                images, scores = item
                t0 = time.time()
                try:
                    for img, score in zip(images, scores):
                        writer.set_id(*img.rse)
                        for c in range(score.shape[-1]):
                            writer.append(
                                out_producer,
                                Image2D(
                                    score[..., c].astype(out_dt),
                                    img.meta,
                                    *img.rse,
                                ),
                            )
                        writer.save_entry()
                except BaseException as e:  # surfaced after join
                    write_err.append(e)
                    return
                finally:
                    timing["write"] += time.time() - t0

        wthread = threading.Thread(target=_write_worker, daemon=True)
        wthread.start()

        def drain(pending):
            images, dev = pending
            t0 = time.time()
            # slice on device BEFORE the D2H read: the final partial
            # batch otherwise transfers its zero-padded rows only to
            # discard them on the host
            if isinstance(dev, tuple):
                hw = images[0].pixels.shape
                scores = self._fetch_sparse(
                    dev[0][: len(images)], dev[1], hw
                )
            else:
                scores = self._fetch(dev[: len(images)])
            timing["forward"] += time.time() - t0
            if write_err:
                raise write_err[0]
            write_q.put((images, scores))

        pending = None
        for start in range(0, n, self.batch_size):
            idxs = range(start, min(start + self.batch_size, n))
            t0 = time.time()
            images = []
            for i in idxs:
                im = prefetched.pop(i, None)
                if im is None:
                    ev = reader.read_entry(i, producers=[producer])
                    imgs = ev[producer]
                    sel = [im for im in imgs
                           if im.meta.plane == plane] or imgs
                    im = sel[0]
                images.append(im)
            batch = np.stack([im.pixels for im in images]).astype(np.float32)[
                ..., None
            ]
            timing["read"] += time.time() - t0

            t0 = time.time()
            # pad the tail batch to the compiled shape (static shapes)
            pad = self.batch_size - batch.shape[0]
            if pad:
                batch = np.concatenate(
                    [batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)]
                )
            dev = self._dispatch(batch)
            timing["forward"] += time.time() - t0
            if pending is not None:
                drain(pending)
            pending = (images, dev)
            if verbose:
                print(f"entries [{start},{start + len(images)}) dispatched",
                      flush=True)
        if pending is not None:
            drain(pending)
        write_q.put(None)
        wthread.join()
        if write_err:
            raise write_err[0]

        writer.close()
        timing["total"] = time.time() - t_total
        if verbose:
            print("------ timing -------")
            for k, v in timing.items():
                print(f"{k} : {v:.3f} s / {v / max(n, 1):.5f} s per event")
        return timing
