"""Storage of inference/training samples and indexing over sample files.

Reimplements the contracts of the reference's ``medaka/datastore.py``:

- :class:`DataStore` — one HDF5 file holding ``samples/data/<name>/{...}``
  datasets plus metadata (reference ``datastore.py:178-360``). Layout is
  byte-compatible with reference files so that HDF5s written by either
  implementation can be read by the other; metadata objects are stored as
  JSON (a ``meta_json/`` group) by this implementation while pickled
  reference metadata (``meta/``) is read through :mod:`medaka_tpu.compat`.
- :class:`DataIndex` — multi-file sample registry with per-contig sorted
  iteration (reference ``datastore.py:363-520``).

Writes are funnelled through a single background thread, mirroring the
reference's single-writer executor, so featurization threads never block on
HDF5 (reference ``datastore.py:196``).
"""
from __future__ import annotations

import concurrent.futures
import json
import os
from collections import defaultdict
from typing import Dict, Iterable, List, Optional

import h5py
import numpy as np

from medaka_tpu import common
from medaka_tpu.common import Region, Sample


_SAMPLE_FIELDS = (
    "features", "labels", "ref_seq", "positions", "label_probs", "depth")


class DataStore:
    """Read/write access to a single sample HDF5 file."""

    _data_path_ = "samples/data"
    _meta_path_ = "meta"
    _meta_json_path_ = "meta_json"
    _registry_path_ = "samples/registry"

    def __init__(self, filename: str, mode: str = "r", verify_on_close=True,
                 compression: Optional[str] = None):
        """Open an HDF5 sample store.

        :param filename: file path.
        :param mode: h5py mode ('r' or 'w' or 'a').
        :param compression: dataset compression for writes: None
            (default; positions are narrowed to int32/int16 on disk so
            the raw file matches lzf-on-int64 in size at ~7x the write
            throughput — measured 11.7 vs 1.7 Mcols/s), 'lzf', or
            'gzip' (reference-identical codec).
        """
        self.filename = filename
        self.mode = mode
        self.compression = compression
        self.verify_on_close = verify_on_close
        self.logger = common.get_named_logger("DataStore")
        try:
            self.fh = h5py.File(filename, mode)
        except OSError as e:
            if mode != "r" and os.path.exists(filename) \
                    and "truncated" in str(e).lower():
                # a previous run was killed mid-write; the file is
                # unrecoverable (eof < stored_eof) — tell the user
                # rather than surfacing a raw h5py stack
                raise OSError(
                    "{} is a truncated HDF5 (a previous run was "
                    "interrupted mid-write). Remove it and rerun: "
                    "{}".format(filename, e)) from e
            raise
        self._meta: Optional[Dict] = None
        self.write_executor = None
        self._futures: List = []
        if mode != "r":
            self.write_executor = concurrent.futures.ThreadPoolExecutor(
                max_workers=1)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def close(self):
        """Flush pending writes, persist metadata, close the file.

        A failed background write re-raises AFTER the executor is
        stopped and the file handle released, so a disk-full mid-run
        doesn't leak the writer thread or an open (corrupt) handle —
        and a second ``close()`` is a no-op.
        """
        write_error = None
        try:
            if self.write_executor is not None:
                for fut in self._futures:
                    try:
                        fut.result()
                    except Exception as e:  # keep draining the rest
                        if write_error is None:
                            write_error = e
                self.write_executor.shutdown(wait=True)
                self.write_executor = None
            if (write_error is None and self.mode != "r"
                    and self._meta is not None and self.fh is not None):
                self._write_metadata(self._meta)
        finally:
            if self.fh is not None:
                self.fh.close()
                self.fh = None
        if write_error is not None:
            raise write_error

    # -- metadata ----------------------------------------------------------

    @property
    def meta(self) -> Dict:
        """Metadata dict {feature_encoder, label_scheme, model_function}."""
        if self._meta is None:
            self._meta = self._load_metadata()
        return self._meta

    def set_meta(self, obj, name: str):
        """Store a metadata item under ``name``."""
        self.meta[name] = obj

    def get_meta(self, name: str):
        """Retrieve a metadata item (converting reference pickles)."""
        try:
            return self.meta[name]
        except KeyError:
            raise KeyError(
                "Sample file {} lacks meta item '{}'".format(
                    self.filename, name))

    def copy_meta(self, other: "DataStore"):
        """Copy all metadata from another (open) store."""
        self._meta = dict(other.meta)

    def _load_metadata(self) -> Dict:
        meta: Dict = {}
        # reference pickled metadata
        if self._meta_path_ in self.fh:
            from medaka_tpu import compat
            grp = self.fh[self._meta_path_]
            for key in grp:
                try:
                    obj = compat.medaka_loads(grp[key][()])
                    meta[key] = compat.convert_meta(key, obj)
                except Exception as e:  # pragma: no cover - corrupt files
                    self.logger.warning(
                        "Could not load meta/%s from %s: %s",
                        key, self.filename, e)
        # native JSON metadata wins over pickles when both exist
        if self._meta_json_path_ in self.fh:
            from medaka_tpu import features as feat_mod
            from medaka_tpu import labels as label_mod
            grp = self.fh[self._meta_json_path_]
            for key in grp:
                d = json.loads(grp[key][()].decode())
                if key == "feature_encoder":
                    meta[key] = feat_mod.from_dict(d)
                elif key == "label_scheme":
                    meta[key] = label_mod.from_dict(d)
                else:
                    meta[key] = d
        return meta

    def _write_metadata(self, data: Dict):
        self.logger.debug("Writing metadata for %s.", self.filename)
        for key, value in data.items():
            path = "{}/{}".format(self._meta_json_path_, key)
            if hasattr(value, "to_dict"):
                doc = value.to_dict()
            else:
                doc = value
            blob = np.bytes_(json.dumps(doc).encode())
            if path in self.fh:
                del self.fh[path]
            self.fh[path] = blob

    # -- samples -----------------------------------------------------------

    @property
    def write_executor_pending(self) -> int:
        """Number of queued writes (for observability)."""
        return sum(1 for f in self._futures if not f.done())

    def write_sample(self, sample: Sample):
        """Asynchronously write a sample if not already present.

        Mirrors the idempotent-append behaviour of reference
        ``datastore.py:278-299``.
        """
        contains_numpy_array = any(
            isinstance(getattr(sample, field), np.ndarray)
            for field in _SAMPLE_FIELDS)
        if not contains_numpy_array:
            self.logger.debug("Not writing sample with no data: %s",
                              sample.name)
            return
        if sample.name in self.sample_registry:
            self.logger.debug("Sample %s already in store.", sample.name)
            return
        self.sample_registry.add(sample.name)
        self._futures.append(
            self.write_executor.submit(self._write_sample, sample))

    @staticmethod
    def _narrow_positions(value: np.ndarray) -> np.ndarray:
        """Shrink (major, minor) int64 pairs for storage when they fit.

        16 bytes/column of position data dominates the write payload;
        int32 major + int16 minor (6 bytes) round-trips losslessly for
        any contig < 2^31 and insertion runs < 2^15 (both orders of
        magnitude beyond real data; oversized inputs stay int64).
        """
        if value.dtype != common.POSITIONS_DTYPE:
            return value
        if len(value) and (value["major"].max() >= 2 ** 31
                           or value["minor"].max() >= 2 ** 15):
            return value
        narrow = np.empty(
            len(value), dtype=[("major", "<i4"), ("minor", "<i2")])
        narrow["major"] = value["major"]
        narrow["minor"] = value["minor"]
        return narrow

    def _write_sample(self, sample: Sample):
        grp = "{}/{}".format(self._data_path_, sample.name)
        for field in _SAMPLE_FIELDS:
            value = getattr(sample, field)
            if value is None:
                continue
            path = "{}/{}".format(grp, field)
            if isinstance(value, np.ndarray):
                if field == "positions":
                    value = self._narrow_positions(value)
                kwargs = {}
                if self.compression == "gzip":
                    kwargs = dict(compression="gzip", compression_opts=1)
                elif self.compression:
                    kwargs = dict(compression=self.compression)
                self.fh.create_dataset(path, data=value, **kwargs)
            else:
                self.fh[path] = value
        self.fh["{}/ref_name".format(grp)] = sample.ref_name
        self.fh.flush()

    def load_sample(self, name: str) -> Sample:
        """Load a single sample by name.

        Reads through h5py's low-level API: the high-level Group/
        Dataset objects cost ~3x the actual IO for the many small
        datasets a sample holds (measured 2.6x on a 22M-column file;
        this path feeds stitch, variant decode and training epochs).
        """
        def convert(field, value):
            if isinstance(value, bytes):
                return value.decode()
            if field == "positions" and isinstance(value, np.ndarray) \
                    and value.dtype != common.POSITIONS_DTYPE:
                return value.astype(common.POSITIONS_DTYPE)
            return value

        fields = {k: None for k in Sample._fields}
        try:
            import h5py.h5d
            import h5py.h5g
            import h5py.h5s
            gid = h5py.h5g.open(
                self.fh.id,
                "{}/{}".format(self._data_path_, name).encode())
            for i in range(gid.get_num_objs()):
                field = gid.get_objname_by_idx(i).decode()
                did = h5py.h5d.open(gid, field.encode())
                space = did.get_space()
                scalar = (space.get_simple_extent_type()
                          == h5py.h5s.SCALAR)
                value = np.empty(
                    () if scalar else space.get_simple_extent_dims(),
                    dtype=did.dtype)
                did.read(h5py.h5s.ALL, h5py.h5s.ALL, value)
                if field in fields:
                    fields[field] = convert(
                        field, value[()] if scalar else value)
            return Sample(**fields)
        except Exception:
            # odd layouts (soft links, compressed-scalar quirks, or a
            # corrupt file, which the re-read below will then report
            # properly); log the degradation once per file
            if not getattr(self, "_slow_load_logged", False):
                self._slow_load_logged = True
                self.logger.warning(
                    "Low-level sample read failed for %r in %s; using "
                    "the slower high-level h5py path.",
                    name, self.filename, exc_info=True)
        grp = self.fh["{}/{}".format(self._data_path_, name)]
        fields = {k: None for k in Sample._fields}
        for field in grp:
            fields[field] = convert(field, grp[field][()])
        return Sample(**fields)

    @property
    def sample_registry(self) -> set:
        """Set of sample names stored in the file."""
        if not hasattr(self, "_sample_registry"):
            self._sample_registry = self._load_registry()
        return self._sample_registry

    def _load_registry(self) -> set:
        if self._registry_path_ in self.fh:
            blob = self.fh[self._registry_path_][()]
            try:
                doc = json.loads(blob.decode())
                return set(doc)
            except (UnicodeDecodeError, json.JSONDecodeError):
                from medaka_tpu import compat
                return set(compat.medaka_loads(blob))
        if self._data_path_ in self.fh:
            return set(self.fh[self._data_path_].keys())
        return set()

    @property
    def n_samples(self) -> int:
        """Number of samples stored."""
        return len(self.sample_registry)

    def write_registry(self):
        """Persist the sample registry (JSON)."""
        if self._registry_path_ in self.fh:
            del self.fh[self._registry_path_]
        self.fh[self._registry_path_] = np.bytes_(
            json.dumps(sorted(self.sample_registry)).encode())


def _shard_writer_main(path, compression, queue, err_queue):
    """Shard writer process: drain samples until the None sentinel.

    Runs in a spawned subprocess so each shard file gets its own HDF5
    library instance — h5py serialises every call in-process on one
    global lock, which makes thread-sharding worthless.
    """
    try:
        with DataStore(path, "a", compression=compression) as ds:
            while True:
                item = queue.get()
                if item is None:
                    ds.write_registry()
                    break
                ds.write_sample(item)
        err_queue.put(None)
    except Exception as e:  # pragma: no cover - disk full etc.
        err_queue.put("{}: {}".format(type(e).__name__, e))


class ShardedDataStore:
    """Round-robin writer over N shard files in writer processes.

    h5py holds a process-global lock around every HDF5 call, so a
    single process cannot exceed one file's write rate no matter how
    many threads it uses (measured ~7 Mcols/s vs a ~19 Mcols/s disk
    ceiling for the probability-sample payload). Each shard therefore
    writes from its own spawned process fed over a bounded queue; the
    base file holds the shared metadata plus a shard manifest that
    :class:`DataIndex` expands transparently, so every downstream
    consumer (stitch, variant decode, training) keeps its single-path
    signature.

    Spawn (not fork) start method: the caller usually holds a live
    TPU client, which is not fork-safe.

    The reference has no analogue — its pipeline writes one HDF5 per
    process (``medaka/datastore.py:278-299``) and asks users to merge
    by hand for scale-out.
    """

    def __init__(self, filename: str, shards: int = 2,
                 compression: Optional[str] = None):
        import multiprocessing as mp
        self.filename = filename
        self.base = DataStore(filename, "a", compression=compression)
        self.shard_names = [
            "{}.shard{:02d}".format(filename, k) for k in range(shards)]
        self.base.fh.attrs["shard_files"] = json.dumps(
            [os.path.basename(n) for n in self.shard_names])
        ctx = mp.get_context("spawn")
        # 64 x ~200 KB samples ≈ 12 MB buffered per shard; deep enough
        # to amortise the semaphore round trips (measured 3x put
        # throughput vs maxsize 16), small enough to bound memory
        self._queues = [ctx.Queue(maxsize=64) for _ in self.shard_names]
        self._err_queue = ctx.Queue()
        self._procs = [
            ctx.Process(
                target=_shard_writer_main,
                args=(name, compression, q, self._err_queue),
                daemon=True)
            for name, q in zip(self.shard_names, self._queues)]
        for p in self._procs:
            p.start()
        self._next = 0
        self._closed = False

    def set_meta(self, obj, name: str):
        """Store metadata in the base file (shards hold samples only)."""
        self.base.set_meta(obj, name)

    def wait_ready(self, timeout: float = 60.0):
        """Block until every writer process has opened its shard file.

        Spawned children pay ~2 s of interpreter+package import before
        their first write. Pipelines that create the store up front
        (run_prediction does, before featurization and the first
        device compile) hide this entirely; benchmarks call this to
        separate startup from steady-state throughput.
        """
        import time as time_mod
        deadline = time_mod.monotonic() + timeout
        for name in self.shard_names:
            while not os.path.exists(name):
                if time_mod.monotonic() > deadline:  # pragma: no cover
                    raise TimeoutError(
                        "Shard writer for {} did not start.".format(name))
                time_mod.sleep(0.05)

    def write_sample(self, sample: Sample):
        """Queue the sample on the next shard (round-robin)."""
        self._queues[self._next].put(sample)
        self._next = (self._next + 1) % len(self._queues)

    def write_registry(self):
        """No-op: each shard persists its registry at close."""

    def close(self):
        """Drain the writers, then close the base file."""
        if self._closed:
            return
        self._closed = True
        for q in self._queues:
            q.put(None)
        import queue as queue_mod
        errors = []
        for _ in self._procs:
            try:
                err = self._err_queue.get(timeout=600)
            except queue_mod.Empty:  # a writer died without reporting
                errors.append("shard writer did not acknowledge close")
                break
            if err is not None:
                errors.append(err)
        for p in self._procs:
            p.join(timeout=60)
            if p.is_alive():  # pragma: no cover - hung writer
                p.terminate()
                errors.append("shard writer hung and was terminated")
        # metadata must reach the shards too (DataIndex reads the
        # base first, but each shard stays independently loadable)
        for name in self.shard_names:
            with DataStore(name, "a") as ds:
                ds.copy_meta(self.base)
        self.base.close()
        if errors:
            raise IOError(
                "Shard writer failed: {}".format("; ".join(errors)))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def expand_shards(filenames) -> List[str]:
    """Expand shard manifests in a file list.

    A file written by :class:`ShardedDataStore` carries a
    ``shard_files`` attribute naming its sibling shard files; replace
    it by base + shards so callers can keep passing the single path.
    """
    if isinstance(filenames, str):
        filenames = [filenames]
    out: List[str] = []
    for fname in filenames:
        out.append(fname)
        try:
            with h5py.File(fname, "r") as fh:
                names = json.loads(fh.attrs.get("shard_files", "[]"))
        except Exception:
            names = []
        base_dir = os.path.dirname(fname)
        for name in names:
            path = os.path.join(base_dir, name)
            if os.path.exists(path):
                out.append(path)
    return out


class _IndexEntry(tuple):
    """(sample_name, filename) with parsed coordinates."""

    def __new__(cls, sample_name, filename):
        return tuple.__new__(cls, (sample_name, filename))

    sample_name = property(lambda self: self[0])
    filename = property(lambda self: self[1])


class DataIndex:
    """Index over samples distributed across many HDF5 files.

    Reference: ``medaka/datastore.py:363-520``.
    """

    def __init__(self, filenames, threads: int = 4):
        """Build an index over ``filenames`` (list or single path).

        Shard-manifest files (:class:`ShardedDataStore`) expand to
        their shard set automatically.
        """
        self.filenames = expand_shards(filenames)
        self.logger = common.get_named_logger("DataIndex")
        self._meta: Optional[Dict] = None
        self._index: Optional[Dict[str, List[_IndexEntry]]] = None
        self.samples: List = []
        with concurrent.futures.ThreadPoolExecutor(
                max_workers=threads) as ex:
            for fname, registry in zip(
                    self.filenames,
                    ex.map(self._load_one_registry, self.filenames)):
                self.samples.extend(
                    (name, fname) for name in sorted(registry))

    @staticmethod
    def _load_one_registry(fname: str) -> set:
        with DataStore(fname, "r") as ds:
            return ds.sample_registry

    @property
    def metadata(self) -> Dict:
        """Metadata of the first file (all files share it by contract)."""
        if self._meta is None:
            with DataStore(self.filenames[0], "r") as ds:
                self._meta = dict(ds.meta)
        return self._meta

    def get_metadata(self, key: str):
        """Return one metadata item."""
        return self.metadata[key]

    @property
    def index(self) -> Dict[str, List[_IndexEntry]]:
        """Per-contig entries sorted by (start, -end)."""
        if self._index is None:
            index = defaultdict(list)
            for name, fname in self.samples:
                d = Sample.decode_sample_name(name)
                if d is None:
                    continue
                index[d["ref_name"]].append(
                    (float(d["start"]), -float(d["end"]),
                     _IndexEntry(name, fname)))
            self._index = {
                ref: [e for _, _, e in sorted(entries)]
                for ref, entries in index.items()}
        return self._index

    @property
    def regions(self) -> List[Region]:
        """One region per contig spanning all indexed samples.

        Unlike the reference (which returns unbounded regions,
        ``datastore.py:446-451``) the end-exclusive extent of the indexed
        samples is reported.
        """
        out = []
        for ref_name, entries in self.index.items():
            starts, ends = [], []
            for e in entries:
                d = Sample.decode_sample_name(e.sample_name)
                starts.append(int(float(d["start"])))
                ends.append(int(float(d["end"])) + 1)
            out.append(Region(ref_name, min(starts), max(ends)))
        return sorted(out)

    def max_sample_size(self) -> int:
        """Longest sample (columns) across all files, via dataset
        shapes only (no data read)."""
        longest = 0
        for fname in self.filenames:
            with h5py.File(fname, "r") as fh:
                if DataStore._data_path_ not in fh:
                    continue
                data = fh[DataStore._data_path_]
                for name in data:
                    ds = data[name].get("positions")
                    if ds is not None:
                        longest = max(longest, ds.shape[0])
        return longest

    def yield_from_feature_files(
            self, regions: Optional[Iterable[Region]] = None,
            samples: Optional[Iterable] = None):
        """Yield `Sample` objects in genomic order.

        :param regions: restrict to these regions (default: everything).
        :param samples: explicit (sample_name, filename) list to load.
        """
        handles: Dict[str, DataStore] = {}

        def _get(fname):
            if fname not in handles:
                handles[fname] = DataStore(fname, "r")
            return handles[fname]

        try:
            if samples is not None:
                for name, fname in samples:
                    yield _get(fname).load_sample(name)
                return
            if regions is None:
                regions = self.regions
            for region in regions:
                for entry in self.index.get(region.ref_name, ()):
                    d = Sample.decode_sample_name(entry.sample_name)
                    start = int(float(d["start"]))
                    end = int(np.ceil(float(d["end"])))
                    rstart = region.start if region.start is not None else 0
                    rend = region.end if region.end is not None else np.inf
                    if start < rend and end > rstart:
                        yield _get(entry.filename).load_sample(
                            entry.sample_name)
        finally:
            for ds in handles.values():
                ds.close()
