"""Inference engine: BAM → features → device batches → probability HDF5.

Functional equivalent of the reference's ``medaka inference``
(reference ``medaka/prediction.py``), redesigned for TPU execution:

- **One static batch shape.** Every chunk — full ``chunk_len`` windows and
  ragged remainders alike — rides in a single ``(B, chunk_len, F)``
  float32 batch with a per-row ``lengths`` vector; the masked GRU scan
  (``ops/rnn.py``) freezes hidden state at padded steps so results are
  bitwise-identical to unpadded computation. This removes the reference's
  second batch-size-1 remainder pass (``prediction.py:196-215``) and
  guarantees XLA compiles the forward exactly once.
- **Threaded host pipeline.** ``bam_workers`` featurization threads feed a
  bounded sample queue; a batcher thread pads and packs fixed arrays; the
  main thread keeps the device busy while HDF5 writes happen on the
  datastore's own writer thread (reference pipeline shape:
  ``prediction.py:225-370``).
- **Device-count agnostic.** When multiple devices are visible the batch
  is sharded over them via ``jax.sharding`` (data parallel over chunks);
  parameters are replicated.
"""
from __future__ import annotations

import collections
import dataclasses
import queue
import threading
from timeit import default_timer as now
from typing import Dict, Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from medaka_tpu import common
from medaka_tpu import datastore as datastore_mod
from medaka_tpu import features as features_mod
from medaka_tpu.common import Region, Sample


@dataclasses.dataclass
class Batch:
    """A fixed-shape inference batch.

    ``features`` is (B, T, F) float32; rows beyond ``n_valid`` are zero
    padding (whole-row padding keeps the batch shape static across the
    tail of the stream). ``lengths`` holds per-row valid column counts.
    """

    features: np.ndarray
    lengths: np.ndarray
    samples: List[Sample]

    @property
    def n_valid(self) -> int:
        """Number of real (non-padding) rows."""
        return len(self.samples)

    @classmethod
    def collate(cls, samples: Sequence[Sample], batch_size: int,
                chunk_len: int, max_reads: Optional[int] = None) -> "Batch":
        """Pack samples into a padded fixed-shape array.

        2-D counts samples produce (B, T, F) float32; 3-D read-level
        samples produce (B, T, R, C) int8 with the reads dim padded to
        a *read bucket*: the smallest of {max_reads/4, max_reads/2,
        max_reads} covering the batch's true depth. The read-level
        model's masked mean-pool ignores all-empty read rows exactly,
        so bucketing is output-invariant while skipping the conv FLOPs
        the static ``max_reads`` padding would spend on padding rows
        (~2x at a typical 30x depth vs max_reads 100; each bucket is
        one XLA program shape, three at most). The reference instead
        pads every batch to its own max depth — one shape *per batch*
        (``torch_ext.py:127-140``), which on TPU would recompile
        constantly.
        """
        first = samples[0].features
        lengths = np.zeros((batch_size,), dtype=np.int32)
        if first.ndim == 3:
            actual = max(s.features.shape[1] for s in samples)
            if max_reads:
                reads = next(
                    b for b in (
                        max(1, max_reads // 4), max(1, max_reads // 2),
                        max_reads)
                    if b >= min(actual, max_reads))
            else:
                reads = actual
            feats = np.zeros(
                (batch_size, chunk_len, reads, first.shape[-1]),
                dtype=np.int8)
            for i, s in enumerate(samples):
                n = min(s.size, chunk_len)
                r = min(s.features.shape[1], reads)
                feats[i, :n, :r] = s.features[:n, :r]
                lengths[i] = n
        else:
            # np.empty + selective zeroing: a full batch of full-length
            # chunks (the steady state) pays no kernel zero-fill pages
            # for the 12.8 MB it is about to overwrite anyway; only row
            # tails and whole padding rows are cleared (they MUST be —
            # uninitialized float garbage can hold NaN/inf, and padded
            # rows do flow through the device forward)
            feats = np.empty(
                (batch_size, chunk_len, first.shape[-1]),
                dtype=np.float32)
            for i, s in enumerate(samples):
                n = min(s.size, chunk_len)
                feats[i, :n] = s.features[:n]
                if n < chunk_len:
                    feats[i, n:] = 0.0
                lengths[i] = n
            if len(samples) < batch_size:
                feats[len(samples):] = 0.0
        return cls(feats, lengths, list(samples))


def _featurize_region_task(bam, region, encoder, chunk_len, chunk_overlap):
    """Featurize one region in a worker process.

    Runs in a spawned child (no JAX/device state); returns picklable
    Samples plus the quarantined short sub-regions' samples.
    """
    from medaka_tpu import features as F

    gen = F.SampleGenerator(
        bam, region, encoder, chunk_len=chunk_len,
        chunk_overlap=chunk_overlap)
    samples = list(gen.samples)
    quarantined = []
    for qregion, _size in gen._quarantined:
        sub = F.SampleGenerator(
            bam, qregion, encoder, enable_chunking=False)
        quarantined.append((qregion, list(sub.samples)))
    return samples, quarantined


class DataLoader:
    """Threaded region → sample → batch pipeline.

    Reference contract: ``medaka/prediction.py:225-370`` (bounded queues,
    ``bam_workers`` producer threads, one batcher thread). Exposes the
    remainder/quarantine accounting the reference tracks, though with the
    masked-scan design quarantined short regions are simply featurized
    with chunking disabled and ride in normal batches.

    ``feature_processes`` moves featurization into worker *processes*
    (spawned, JAX-free). Measured on the 4-core dev host the THREAD
    path wins (7.1 Mcols/s at 4 workers with the int32 native pileup
    kernel, which releases the GIL) while processes pay sample
    pickling/IPC (~1.8 Mcols/s); the flag exists for many-core hosts where thread
    marshalling may saturate. Workers are spawned, so programmatic
    callers need the standard ``if __name__ == "__main__"`` guard (the
    CLI always satisfies this).
    """

    def __init__(self, bam, regions: Iterable[Region], feature_encoder,
                 batch_size: int = 128, chunk_len: int = 10000,
                 chunk_overlap: int = 1000, bam_workers: int = 2,
                 sample_cache_size: int = 8, batch_cache_size: int = 8,
                 feature_processes: int = 0,
                 emit_region_events: bool = False):
        """``emit_region_events=True`` makes iteration yield
        ``("rdone", region_index)`` markers after the last batch that
        can contain a region's samples — the direct consensus path uses
        them to flush stitch windows with bounded memory."""
        self.logger = common.get_named_logger("DataLoader")
        self.bam = bam
        self.regions = list(regions)
        self.fencoder = feature_encoder
        self.batch_size = batch_size
        self.chunk_len = chunk_len
        self.chunk_overlap = chunk_overlap
        self.bam_workers = max(1, bam_workers)
        self.emit_region_events = emit_region_events
        self._sample_q: "queue.Queue" = queue.Queue(
            maxsize=sample_cache_size * batch_size)
        self._batch_q: "queue.Queue" = queue.Queue(maxsize=batch_cache_size)
        self._region_q: "queue.Queue" = queue.Queue()
        for rid, region in enumerate(self.regions):
            self._region_q.put((rid, region))
        self._errors: List[BaseException] = []
        self.n_samples = 0
        self.remainder_regions: List[Region] = []
        self.feature_processes = feature_processes

        if feature_processes > 0:
            self._workers = [threading.Thread(
                target=self._process_pool_feeder, daemon=True,
                name="feature_proc_feeder")]
        else:
            self._workers = [
                threading.Thread(
                    target=self._region_worker, daemon=True,
                    name="bam_worker_{}".format(i))
                for i in range(self.bam_workers)]
        self._batcher = threading.Thread(
            target=self._batch_worker, daemon=True, name="batcher")
        for t in self._workers:
            t.start()
        self._batcher.start()

    def _process_pool_feeder(self):
        import concurrent.futures
        import multiprocessing

        try:
            ctx = multiprocessing.get_context("spawn")
            with concurrent.futures.ProcessPoolExecutor(
                    self.feature_processes, mp_context=ctx) as ex:
                in_flight = collections.deque()
                region_iter = iter(enumerate(self.regions))
                exhausted = False
                while in_flight or not exhausted:
                    while not exhausted and \
                            len(in_flight) < 2 * self.feature_processes:
                        try:
                            rid, region = next(region_iter)
                        except StopIteration:
                            exhausted = True
                            break
                        in_flight.append((rid, ex.submit(
                            _featurize_region_task, self.bam, region,
                            self.fencoder, self.chunk_len,
                            self.chunk_overlap)))
                    if not in_flight:
                        break
                    rid, fut = in_flight.popleft()
                    samples, quarantined = fut.result()
                    for sample in samples:
                        self._sample_q.put((rid, sample))
                    for qregion, qsamples in quarantined:
                        self.remainder_regions.append(qregion)
                        for sample in qsamples:
                            self._sample_q.put((rid, sample))
                    self._sample_q.put(("rdone", rid))
        except BaseException as e:  # pragma: no cover
            self.logger.exception("Featurization process pool failed.")
            self._errors.append(e)
        finally:
            self._sample_q.put(None)

    def _region_worker(self):
        try:
            while True:
                try:
                    rid, region = self._region_q.get_nowait()
                except queue.Empty:
                    break
                gen = features_mod.SampleGenerator(
                    self.bam, region, self.fencoder,
                    chunk_len=self.chunk_len,
                    chunk_overlap=self.chunk_overlap)
                for sample in gen.samples:
                    self._sample_q.put((rid, sample))
                # short regions were quarantined: featurize unchunked
                for qregion, _size in gen._quarantined:
                    self.remainder_regions.append(qregion)
                    sub = features_mod.SampleGenerator(
                        self.bam, qregion, self.fencoder,
                        enable_chunking=False)
                    for sample in sub.samples:
                        self._sample_q.put((rid, sample))
                self._sample_q.put(("rdone", rid))
        except BaseException as e:  # pragma: no cover - surfaced on join
            self.logger.exception("Featurization worker failed.")
            self._errors.append(e)
        finally:
            self._sample_q.put(None)

    def _batch_worker(self):
        done_workers = 0
        pending: List[Sample] = []
        pending_rids: List[int] = []
        held_events: List[int] = []

        def flush_events():
            if self.emit_region_events:
                for done_rid in held_events:
                    self._batch_q.put(("rdone", done_rid))
            held_events.clear()

        try:
            while done_workers < len(self._workers):
                item = self._sample_q.get()
                if item is None:
                    done_workers += 1
                    continue
                rid, payload = item
                if rid == "rdone":
                    # safe to forward once no pending sample belongs to
                    # the finished region; otherwise hold until the
                    # batch containing those samples is emitted
                    if payload in pending_rids:
                        held_events.append(payload)
                    elif self.emit_region_events:
                        self._batch_q.put(("rdone", payload))
                    continue
                if payload.size > self.chunk_len:
                    # unchunked sample wider than the static shape: split
                    for piece in payload.chunks(
                            chunk_len=self.chunk_len,
                            overlap=self.chunk_overlap):
                        pending.append(piece)
                        pending_rids.append(rid)
                        if len(pending) == self.batch_size:
                            self._emit(pending)
                            pending, pending_rids = [], []
                            flush_events()
                    continue
                pending.append(payload)
                pending_rids.append(rid)
                if len(pending) == self.batch_size:
                    self._emit(pending)
                    pending, pending_rids = [], []
                    flush_events()
            if pending:
                self._emit(pending)
                pending, pending_rids = [], []
            flush_events()
        except BaseException as e:  # pragma: no cover
            self.logger.exception("Batcher failed.")
            self._errors.append(e)
        finally:
            self._batch_q.put(None)

    def _emit(self, samples: List[Sample]):
        self.n_samples += len(samples)
        self._batch_q.put(
            Batch.collate(
                samples, self.batch_size, self.chunk_len,
                max_reads=getattr(self.fencoder, "max_reads", None)))

    def __iter__(self):
        while True:
            batch = self._batch_q.get()
            if batch is None:
                break
            yield batch
        for t in self._workers:
            t.join()
        self._batcher.join()
        if self._errors:
            raise self._errors[0]


class Predictor:
    """Jitted forward pass over fixed-shape batches, sharded over devices.

    Parameters are replicated; the batch dimension is sharded across all
    visible devices of ``mesh`` (data parallelism over genome chunks —
    the TPU-native analogue of the reference's scale-out-by-region advice,
    ``README.md:294-330``).
    """

    def __init__(self, model, params, mesh: Optional[jax.sharding.Mesh]
                 = None, compute_dtype=jnp.bfloat16,
                 compact_transfer: Optional[bool] = None):
        """:param compact_transfer: halve host<->device bytes by sending
        features as bfloat16 (the model computes in bf16 anyway) and
        fetching float16 log-probabilities (log space preserves the
        quality-score precision near p=1 that a float16 probability
        would lose). Default: on when ``compute_dtype`` is bfloat16 and
        the backend is not CPU; off for full-precision runs.
        """
        self.model = model
        self.compute_dtype = compute_dtype
        if compact_transfer is None:
            compact_transfer = (
                compute_dtype == jnp.bfloat16
                and jax.default_backend() not in ("cpu",))
        self.compact_transfer = compact_transfer
        if mesh is None:
            devices = jax.devices()
            mesh = jax.sharding.Mesh(np.array(devices), ("data",))
        self.mesh = mesh
        spec_batch = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("data"))
        spec_repl = jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec())
        self.params = jax.device_put(params, spec_repl)
        self._batch_sharding = spec_batch

        def forward(params, x, lengths):
            if self.compact_transfer:
                logits = self.model.apply(
                    params, x.astype(jnp.float32), normalise=False,
                    compute_dtype=compute_dtype, lengths=lengths)
                return jax.nn.log_softmax(
                    logits, axis=-1).astype(jnp.float16)
            return self.model.apply(
                params, x, normalise=True,
                compute_dtype=compute_dtype, lengths=lengths)

        def forward_decode(params, x, lengths):
            # on-device argmax decode: fetch 3 bytes/column (class +
            # f16 best value) instead of 10 (5 x f16 log-probs). The
            # f16 rounding of the log-probs is applied BEFORE the
            # argmax/max so the result is the same as decoding the
            # fetched probabilities host-side (the HDF5 path).
            out = forward(params, x, lengths)
            classes = jnp.argmax(out, axis=-1).astype(jnp.uint8)
            best = jnp.max(out, axis=-1)
            return classes, best

        def build(fn, nout=1):
            if mesh.devices.size > 1:
                # batch rows are independent: run the per-shard forward
                # under shard_map so each device executes the model
                # (including fused Pallas kernels) on its local slice —
                # the canonical pallas-under-SPMD pattern; plain GSPMD
                # would have to partition the kernels' custom calls.
                pspec_b = jax.sharding.PartitionSpec(mesh.axis_names)
                out_specs = pspec_b if nout == 1 else (pspec_b,) * nout
                return jax.jit(jax.shard_map(
                    fn, mesh=mesh,
                    in_specs=(jax.sharding.PartitionSpec(),
                              pspec_b, pspec_b),
                    out_specs=out_specs, check_vma=False))
            out_shardings = spec_batch if nout == 1 \
                else (spec_batch,) * nout
            return jax.jit(
                fn,
                in_shardings=(spec_repl, spec_batch, spec_batch),
                out_shardings=out_shardings)

        self._forward = build(forward)
        self._forward_decode = build(forward_decode, nout=2)

    def dispatch(self, batch: Batch, decode: bool = False):
        """Asynchronously launch a batch; returns an opaque handle.

        JAX dispatch is asynchronous: this returns as soon as the
        transfer + computation are enqueued, so the caller can overlap
        device work with host-side featurization and output writing
        (fetch the previous batch while the next one runs).

        ``decode=True`` runs the on-device argmax decode head; fetch
        the handle with :meth:`fetch_decoded`.
        """
        n_dev = self.mesh.devices.size
        feats, lengths = batch.features, batch.lengths
        pad = (-feats.shape[0]) % n_dev
        if pad:
            widths = [(0, pad)] + [(0, 0)] * (feats.ndim - 1)
            feats = np.pad(feats, widths)
            lengths = np.pad(lengths, (0, pad))
        if self.compact_transfer and np.issubdtype(
                feats.dtype, np.floating):
            feats_dev = jnp.asarray(feats, dtype=jnp.bfloat16)
        else:
            feats_dev = jnp.asarray(feats)
        fwd = self._forward_decode if decode else self._forward
        return fwd(self.params, feats_dev, jnp.asarray(lengths))

    def fetch(self, handle, n_valid: int) -> np.ndarray:
        """Block on a :meth:`dispatch` handle; (n_valid, T, C) probs."""
        out = np.asarray(handle[:n_valid]).astype(np.float32)
        if self.compact_transfer:
            out = np.exp(out)
        return out

    def fetch_decoded(self, handle, n_valid: int, phred_fn):
        """Block on a ``dispatch(decode=True)`` handle.

        :param phred_fn: error-probability -> phred mapping (the label
            scheme's ``_phred``, run host-side in the same numpy
            arithmetic as the HDF5 path's ``decode_consensus`` so the
            quality characters are byte-identical).
        :returns: (classes uint8 (n_valid, T), qual chars uint8).
        """
        classes, best = handle
        classes = np.asarray(classes[:n_valid])
        best = np.asarray(best[:n_valid]).astype(np.float32)
        if self.compact_transfer:
            best = np.exp(best)
        quals = (phred_fn(1.0 - best).astype("u1") + 33)
        return classes, quals

    def predict_on_batch(self, batch: Batch) -> np.ndarray:
        """Probabilities (n_valid, T, C) for the real rows of a batch."""
        return self.fetch(self.dispatch(batch), batch.n_valid)


def auto_batch_size(model, backend=None, chunk_len: int = 10000,
                    hbm_bytes: Optional[int] = None) -> int:
    """TPU-first default inference batch size, scaled to fit HBM.

    Large batches keep the fused recurrence kernels MXU-bound: on a
    v5e chip the transposed split-path 2x256 counts bi-GRU measures
    40.4M cols/s at B=512, 46.0M at B=1024, 49.8M at B=2048 and 50.8M
    at B=2560 (tests/perf/kernel_lab.py v6 sweep). The batch is sized
    from the peak-phase HBM model of the transposed path — the two
    (T, H, B) int8 inter-layer buffers live alongside the two
    (T, C->8-sublane, B) f32 logit partials during the layer-2 kernel
    — calibrated so the default 2x256/T=10000 geometry on 16 GB HBM
    lands on the verified B=2560, and wider models or longer chunks
    degrade gracefully instead of hitting a compile-time wall. CPU
    backends and read-level (4D-feature) models use 128 (measured 3x
    the throughput of B=8; conv activations bound larger batches).
    """
    if backend is None:
        backend = jax.default_backend()
    if backend == "cpu" or \
            getattr(model, "input_kind", "counts") != "counts":
        return 128
    if hbm_bytes is None:
        try:
            stats = jax.devices()[0].memory_stats() or {}
            hbm_bytes = stats.get("bytes_limit")
        except Exception:
            hbm_bytes = None
        if not hbm_bytes:
            hbm_bytes = 16 << 30
    hidden = getattr(model, "gru_size", 256)
    split_path = (
        getattr(model, "bidirectional", True)
        and getattr(model, "n_layers", 2) == 2
        and hidden % 128 == 0)
    if split_path:
        # two int8 inter-layer buffers + two 8-sublane f32 logit
        # partials (the transposed split path's peak phase)
        per_row = chunk_len * (2 * hidden + 2 * 8 * 4)
        budget = int(0.87 * hbm_bytes)
        cap = 2560
    else:
        # legacy fullfused kernels: two live (T, B, 2H) bf16
        # inter-layer concat buffers (B=1024 verified to fail at the
        # default geometry under this model)
        width = 2 * hidden if getattr(model, "bidirectional", True) \
            else hidden
        per_row = 2 * chunk_len * width * 2
        budget = int(0.62 * hbm_bytes)
        cap = 512
    batch = (budget // per_row) // 64 * 64
    return int(max(32, min(cap, batch)))


def run_prediction(
        output: str, bam, regions: Sequence[Region], model, params,
        feature_encoder, label_scheme=None,
        batch_size: Optional[int] = None,
        chunk_len: int = 10000, chunk_overlap: int = 1000,
        bam_workers: int = 2, compute_dtype=jnp.bfloat16,
        mesh=None, full_precision: bool = False,
        save_features: bool = False, feature_processes: int = 0,
        output_shards: int = 1):
    """Run inference and write probability samples to ``output``.

    Reference: ``medaka/prediction.py:14-81``.

    :param batch_size: rows per device batch (None: auto, see
        :func:`auto_batch_size`).
    :param output_shards: >1 writes samples round-robin across that
        many shard files with parallel writer threads
        (:class:`datastore.ShardedDataStore`); ``output`` then holds
        the metadata + shard manifest and downstream consumers expand
        it transparently via ``DataIndex``. Lifts the single-file
        HDF5 write ceiling for fast hosts.
    :returns: (n_samples, n_columns) processed.
    """
    logger = common.get_named_logger("PWorker")
    if full_precision:
        compute_dtype = None
    if batch_size is None:
        batch_size = auto_batch_size(model, chunk_len=chunk_len)
        logger.info("Auto batch size: %d.", batch_size)
    predictor = Predictor(
        model, params, mesh=mesh, compute_dtype=compute_dtype)
    loader = DataLoader(
        bam, regions, feature_encoder, batch_size=batch_size,
        chunk_len=chunk_len, chunk_overlap=chunk_overlap,
        bam_workers=bam_workers, feature_processes=feature_processes)

    total_region_mbases = sum(r.size for r in regions) / 1e6
    t0 = now()
    tlast = t0
    n_columns = 0
    mbases_done = 0.0

    if output_shards > 1:
        store = datastore_mod.ShardedDataStore(
            output, shards=output_shards)
    else:
        store = datastore_mod.DataStore(output, "a")
    with store as ds:
        if feature_encoder is not None:
            ds.set_meta(feature_encoder, "feature_encoder")
        if label_scheme is not None:
            ds.set_meta(label_scheme, "label_scheme")
        ds.set_meta(model.to_dict(), "model_function")
        def drain(pending_batch, handle):
            nonlocal n_columns, tlast
            probs = predictor.fetch(handle, pending_batch.n_valid)
            for i, sample in enumerate(pending_batch.samples):
                n = sample.size
                n_columns += n
                ds.write_sample(
                    sample.amend(
                        features=sample.features if save_features
                        else None,
                        label_probs=probs[i, :n]))
            t1 = now()
            if t1 - tlast > 10:
                tlast = t1
                logger.info(
                    "%.1f%% Done (~%.2f Mbases) in %.1fs",
                    100 * min(1.0, n_columns / 1e6 / max(
                        1e-9, total_region_mbases)),
                    n_columns / 1e6, t1 - t0)

        # keep max_in_flight batches dispatched ahead of the fetch so
        # device compute and host->device transfers overlap both
        # featurization and HDF5 writes; 2 covers a host stall without
        # growing device memory pressure (each slot holds one batch of
        # activations)
        max_in_flight = 2
        pending = collections.deque()
        for batch in loader:
            pending.append((batch, predictor.dispatch(batch)))
            if len(pending) > max_in_flight:
                drain(*pending.popleft())
        while pending:
            drain(*pending.popleft())
        mbases_done = n_columns / 1e6
        ds.write_registry()

    t1 = now()
    logger.info(
        "Processed %d samples (%d columns) in %.2fs (%.0f columns/s).",
        loader.n_samples, n_columns, t1 - t0,
        n_columns / max(1e-9, t1 - t0))
    return loader.n_samples, n_columns


def run_prediction_direct(
        output_fastx: str, bam, regions: Sequence[Region], model, params,
        feature_encoder, label_scheme, draft_path: str,
        batch_size: Optional[int] = None,
        chunk_len: int = 10000, chunk_overlap: int = 1000,
        bam_workers: int = 2, compute_dtype=jnp.bfloat16,
        mesh=None, full_precision: bool = False,
        feature_processes: int = 0, min_depth: int = 0,
        fillgaps: bool = True, fill_char: Optional[str] = None,
        qualities: bool = False):
    """Consensus-only fast path: argmax + qual decoded ON DEVICE.

    The HDF5 contract (:func:`run_prediction` -> ``stitch``) fetches
    (T, 5) float16 log-probabilities (10 bytes/column) and round-trips
    them through a probability HDF5 that stitch immediately reduces to
    argmax + quality. When the probabilities have no downstream
    consumer (plain ``consensus``), this path computes the reduction
    on the chip, fetches 3 bytes/column, and streams decoded samples
    straight into :class:`stitch.DirectStitcher` — no probability file
    is written or re-read. Output is byte-identical to the HDF5 path
    (pinned by ``tests/test_workflows.py``).

    :returns: (n_samples, n_columns).
    """
    from medaka_tpu import stitch as stitch_mod

    logger = common.get_named_logger("PWorker")
    if label_scheme is None:
        raise ValueError(
            "The direct consensus path needs the model bundle's label "
            "scheme (argmax classes are decoded to its symbols).")
    from medaka_tpu import labels as labels_mod
    if getattr(type(label_scheme), "decode_consensus", None) is not \
            labels_mod.HaploidLabelScheme.decode_consensus:
        # RLE expands (base, run) classes and diploid has 15 classes —
        # neither is a plain symbols[argmax] decode, so the on-device
        # 1-byte class + 1-byte qual contract cannot represent them
        raise ValueError(
            "--direct supports plain haploid consensus decoding only; "
            "{} overrides decode_consensus (e.g. RLE run expansion). "
            "Use the default HDF5 path for this model.".format(
                type(label_scheme).__name__))
    if full_precision:
        compute_dtype = None
    if batch_size is None:
        batch_size = auto_batch_size(model, chunk_len=chunk_len)
        logger.info("Auto batch size: %d.", batch_size)
    predictor = Predictor(
        model, params, mesh=mesh, compute_dtype=compute_dtype)
    loader = DataLoader(
        bam, regions, feature_encoder, batch_size=batch_size,
        chunk_len=chunk_len, chunk_overlap=chunk_overlap,
        bam_workers=bam_workers, feature_processes=feature_processes,
        emit_region_events=True)
    stitcher = stitch_mod.DirectStitcher(
        draft_path, regions, label_scheme, output_fastx,
        min_depth=min_depth, fillgaps=fillgaps, fill_char=fill_char,
        qualities=qualities)

    total_region_mbases = sum(r.size for r in regions) / 1e6
    t0 = now()
    tlast = t0
    n_columns = 0
    phred_fn = label_scheme._phred

    def drain(item):
        nonlocal n_columns, tlast
        if item[0] == "rdone":
            # ordered behind every batch holding this region's samples
            stitcher.region_done(item[1])
            return
        pending_batch, handle = item
        classes, quals = predictor.fetch_decoded(
            handle, pending_batch.n_valid, phred_fn)
        for i, sample in enumerate(pending_batch.samples):
            n = sample.size
            n_columns += n
            decoded = np.empty((n, 2), dtype=np.uint8)
            decoded[:, 0] = classes[i, :n]
            decoded[:, 1] = quals[i, :n]
            stitcher.add_sample(sample.amend(
                features=None, labels=None, label_probs=decoded))
        t1 = now()
        if t1 - tlast > 10:
            tlast = t1
            logger.info(
                "%.1f%% Done (~%.2f Mbases) in %.1fs",
                100 * min(1.0, n_columns / 1e6 / max(
                    1e-9, total_region_mbases)),
                n_columns / 1e6, t1 - t0)

    max_in_flight = 2
    pending = collections.deque()
    in_flight = 0
    for item in loader:
        if isinstance(item, tuple) and item and item[0] == "rdone":
            # keep ordering with the batches ahead of it
            pending.append(item)
            continue
        pending.append((item, predictor.dispatch(item, decode=True)))
        in_flight += 1
        while in_flight > max_in_flight:
            head = pending.popleft()
            if head[0] != "rdone":
                in_flight -= 1
            drain(head)
    while pending:
        head = pending.popleft()
        drain(head)
    stitcher.finish()

    t1 = now()
    logger.info(
        "Processed %d samples (%d columns) in %.2fs (%.0f columns/s).",
        loader.n_samples, n_columns, t1 - t0,
        n_columns / max(1e-9, t1 - t0))
    return loader.n_samples, n_columns


def predict_direct(
        bam, output_fastx: str, draft_path: str,
        model_path: Optional[str] = None,
        model=None, params=None, feature_encoder=None, label_scheme=None,
        regions: Optional[Sequence[Region]] = None,
        batch_size: Optional[int] = None, chunk_len: int = 10000,
        chunk_overlap: int = 1000, bam_workers: int = 2,
        bam_chunk: int = 1_000_000, full_precision: bool = False,
        mesh=None, feature_processes: int = 0, min_depth: int = 0,
        fillgaps: bool = True, fill_char: Optional[str] = None,
        qualities: bool = False):
    """BAM -> polished fasta/fastq with on-device decode (no HDF5)."""
    logger = common.get_named_logger("Predict")
    if model_path is not None:
        from medaka_tpu import models as models_mod
        bundle = models_mod.open_model(model_path)
        model = bundle.model
        params = bundle.params
        feature_encoder = feature_encoder or bundle.feature_encoder
        label_scheme = label_scheme or bundle.label_scheme
    if model is None or params is None or feature_encoder is None:
        raise ValueError(
            "Provide model_path or explicit model/params/feature_encoder.")
    model.check_feature_encoder_compatibility(feature_encoder)
    work = plan_work(regions, bam, bam_chunk, chunk_overlap)
    logger.info(
        "Processing %d region chunk(s) over %d device(s) (direct "
        "decode).", len(work),
        len(jax.devices()) if mesh is None else mesh.devices.size)
    return run_prediction_direct(
        output_fastx, bam, work, model, params, feature_encoder,
        label_scheme, draft_path, batch_size=batch_size,
        chunk_len=chunk_len, chunk_overlap=chunk_overlap,
        bam_workers=bam_workers, full_precision=full_precision,
        mesh=mesh, feature_processes=feature_processes,
        min_depth=min_depth, fillgaps=fillgaps, fill_char=fill_char,
        qualities=qualities)


def plan_work(regions, bam, bam_chunk: int = 1_000_000,
              chunk_overlap: int = 1000) -> List[Region]:
    """The deterministic per-run work list of sub-regions.

    Large regions are split into ``bam_chunk`` pieces overlapping by
    ``chunk_overlap`` columns so chunk joins can be overlap-trimmed
    at stitch time (reference splits identically,
    ``medaka/prediction.py:102-110``). With ``regions=None`` the
    whole-contig regions come from the BAM header.

    This is also the unit of multi-host work division
    (``parallel.shard_regions``): every host computes this same list,
    so striding it divides even a single-contig genome evenly and the
    union over hosts is exactly the single-host work list.
    """
    if bam is not None:
        # fills whole-BAM regions and resolves open-ended user regions
        # (e.g. "ctg0") against the BAM header lengths
        regions = common.get_bam_regions(bam, regions)
    elif regions is None:
        raise ValueError("plan_work needs regions when no BAM is given.")
    work: List[Region] = []
    for region in regions:
        if region.size > bam_chunk:
            work.extend(region.split(
                bam_chunk, overlap=chunk_overlap, fixed_size=False))
        else:
            work.append(region)
    return work


def predict(
        bam, output: str, model_path: Optional[str] = None,
        model=None, params=None, feature_encoder=None, label_scheme=None,
        regions: Optional[Sequence[Region]] = None,
        batch_size: Optional[int] = None, chunk_len: int = 10000,
        chunk_overlap: int = 1000, bam_workers: int = 2,
        bam_chunk: int = 1_000_000, full_precision: bool = False,
        mesh=None, encoder_overrides: Optional[Dict] = None,
        save_features: bool = False, feature_processes: int = 0,
        output_shards: int = 1):
    """Top-level inference entry (reference ``prediction.py:84-222``).

    Either ``model_path`` (native tarball or reference ``.tar.gz``) or an
    explicit (model, params, feature_encoder, label_scheme) must be given.

    :param encoder_overrides: attribute overrides applied to the
        feature encoder (read filters: ``read_group``, ``min_mapq``,
        ``tag_name``, ``tag_value``, ``tag_keep_missing`` — the
        reference's ``--RG``/``--tag_*`` flags).
    """
    logger = common.get_named_logger("Predict")
    if model_path is not None:
        from medaka_tpu import models as models_mod
        bundle = models_mod.open_model(model_path)
        model = bundle.model
        params = bundle.params
        feature_encoder = feature_encoder or bundle.feature_encoder
        label_scheme = label_scheme or bundle.label_scheme
    if encoder_overrides and feature_encoder is not None:
        for key, value in encoder_overrides.items():
            if not hasattr(feature_encoder, key):
                raise ValueError(
                    "Feature encoder {} has no filter attribute "
                    "{!r}.".format(type(feature_encoder).__name__, key))
            setattr(feature_encoder, key, value)
            logger.info("Encoder override: %s=%r", key, value)
    if model is None or params is None or feature_encoder is None:
        raise ValueError(
            "Provide model_path or explicit model/params/feature_encoder.")
    model.check_feature_encoder_compatibility(feature_encoder)
    if getattr(model, "input_kind", "counts") == "reads" \
            and chunk_len > 2000:
        logger.warning(
            "chunk_len=%d with a read-level model implies very large "
            "(batch, %d, reads, features) device tensors; consider "
            "--chunk_len 1000.", chunk_len, chunk_len)

    work = plan_work(regions, bam, bam_chunk, chunk_overlap)
    logger.info(
        "Processing %d region chunk(s) over %d device(s).",
        len(work), len(jax.devices()) if mesh is None
        else mesh.devices.size)
    return run_prediction(
        output, bam, work, model, params, feature_encoder,
        label_scheme=label_scheme, batch_size=batch_size,
        chunk_len=chunk_len, chunk_overlap=chunk_overlap,
        bam_workers=bam_workers, full_precision=full_precision,
        mesh=mesh, save_features=save_features,
        feature_processes=feature_processes,
        output_shards=output_shards)


def predict_from_features(
        inputs, output: str, model_path: Optional[str] = None,
        model=None, params=None, batch_size: Optional[int] = None,
        full_precision: bool = False, mesh=None):
    """Run inference over precomputed feature files (no BAM).

    Reference: the ``consensus_from_features`` subcommand
    (``medaka/medaka.py:616-630`` -> ``prediction.py``): samples are
    read back from feature HDF5s, batched to the model's static shape
    and written out with ``label_probs``.
    """
    from medaka_tpu import datastore as ds_mod
    from medaka_tpu import models as models_mod

    logger = common.get_named_logger("PWorker")
    index = ds_mod.DataIndex(
        inputs if isinstance(inputs, (list, tuple)) else [inputs])
    feature_encoder = index.metadata.get("feature_encoder")
    label_scheme = index.metadata.get("label_scheme")
    if model_path is not None:
        bundle = models_mod.open_model(model_path)
        model, params = bundle.model, bundle.params
        feature_encoder = bundle.feature_encoder or feature_encoder
        label_scheme = bundle.label_scheme or label_scheme
    if model is None:
        raise ValueError("Provide model_path or model/params.")
    compute_dtype = None if full_precision else jnp.bfloat16
    predictor = Predictor(
        model, params, mesh=mesh, compute_dtype=compute_dtype)

    samples = index.yield_from_feature_files()
    first = next(samples, None)
    if first is None:
        raise ValueError("No samples found in inputs.")
    # one static time dimension for EVERY batch: collating each group
    # to its own max would recompile the forward per distinct shape
    # (dataset shapes are read without loading any data)
    chunk_len = max(first.size, index.max_sample_size())
    if batch_size is None:
        batch_size = auto_batch_size(model, chunk_len=chunk_len)
        logger.info("Auto batch size: %d.", batch_size)

    import itertools
    n_samples = n_columns = 0
    t0 = now()
    with datastore_mod.DataStore(output, "a") as out_ds:
        if feature_encoder is not None:
            out_ds.set_meta(feature_encoder, "feature_encoder")
        if label_scheme is not None:
            out_ds.set_meta(label_scheme, "label_scheme")
        out_ds.set_meta(model.to_dict(), "model_function")
        for group in common.grouper(
                itertools.chain([first], samples), batch_size):
            group = list(group)
            batch = Batch.collate(
                group, batch_size, chunk_len,
                max_reads=getattr(feature_encoder, "max_reads", None))
            probs = predictor.predict_on_batch(batch)
            for i, sample in enumerate(group):
                n_samples += 1
                n_columns += sample.size
                out_ds.write_sample(sample.amend(
                    features=None, labels=None,
                    label_probs=probs[i, :sample.size]))
        out_ds.write_registry()
    logger.info(
        "Processed %d samples (%d columns) in %.2fs.",
        n_samples, n_columns, now() - t0)
    return n_samples, n_columns
