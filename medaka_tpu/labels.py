"""Label schemes: encode truth alignments, decode network outputs.

Parity target: ``medaka/labels.py`` (TruthAlignment: labels.py:27-260,
schemes: labels.py:269-1324). The variant-column marking recurrence of the
reference C helper (``src/medaka_rnn_variants.c:28-55``) is reimplemented as
a vectorised grouped reduction.
"""
from __future__ import annotations

import abc
import collections
import functools
import importlib
import itertools
from copy import copy
from typing import Optional

import numpy as np

from medaka_tpu import common, vcf
from medaka_tpu.common import Region, Sample
from medaka_tpu.io.bam import BamReader
from medaka_tpu.utils.intervals import IntervalSet


def from_dict(d):
    """Instantiate a label scheme from a config dict."""
    module = importlib.import_module(__name__)
    kwargs = d.get("kwargs", {})
    return getattr(module, d["type"])(**kwargs)


class TruthAlignment:
    """A truth-to-reference alignment segment used to derive labels."""

    def __init__(self, alignment):
        """Wrap a `BamRecord`; start/end may be trimmed by filtering."""
        self.aln = alignment
        self.start = alignment.reference_start
        self.end = alignment.reference_end
        self.is_kept = True
        self.logger = common.get_named_logger("TruthAlign")

    @staticmethod
    def _filter_alignments(
            alignments, region, min_length=1000, length_ratio=2.0,
            overlap_fraction=0.5):
        """Resolve overlapping truth segments and drop unusable ones.

        Same four-case overlap policy as the reference
        (``labels.py:53-136``): for each overlapping pair, segments of
        comparable length split the disputed window (or are both
        dropped when one is mostly engulfed), while a much longer
        segment wins the window outright (the engulfed shorter one is
        dropped).
        """
        ACGT = frozenset("ACGT")

        def clean(al):
            return (
                ACGT.issuperset(al.aln.get_reference_sequence().upper())
                and ACGT.issuperset(al.aln.query_sequence.upper()))

        kept = [
            copy(a) for a in alignments
            # zero-reference-length records (insert-only CIGARs) have
            # no window to dispute and would divide by zero below;
            # the min_length filter drops them regardless
            if a.aln.reference_length > 0 and clean(a)]

        for a, b in itertools.combinations(kept, 2):
            left, right = sorted(
                (a, b), key=lambda t: t.aln.reference_start)
            disputed = (left.aln.reference_end
                        - right.aln.reference_start)
            if disputed <= 0:
                continue
            small, big = sorted(
                (a, b), key=lambda t: t.aln.reference_length)
            engulfed = (disputed / small.aln.reference_length
                        >= overlap_fraction)
            comparable = (big.aln.reference_length
                          < length_ratio * small.aln.reference_length)
            if engulfed:
                small.is_kept = False
                if comparable:
                    big.is_kept = False
            else:
                right.start = left.aln.reference_end
                if comparable:
                    left.end = right.aln.reference_start

        for al in kept:
            if region.start > 0:
                al.start = max(region.start, al.start)
            if region.end is not None:
                al.end = min(region.end, al.end)
        return sorted(
            (al for al in kept
             if al.is_kept and al.end - al.start >= min_length),
            key=lambda t: t.start)

    @staticmethod
    def _load_alignments(truth_bam, region, haplotag=None):
        alignments = collections.defaultdict(list)
        with BamReader(truth_bam) as bam:
            for rec in bam.fetch(region.ref_name, region.start, region.end):
                if rec.is_unmapped or rec.is_secondary:
                    continue
                hap = rec.get_tag(haplotag) if haplotag is not None else None
                alignments[hap].append(TruthAlignment(rec))
        for hap in alignments:
            alignments[hap].sort(key=lambda t: t.start)
        return alignments

    @staticmethod
    def _group_and_trim_by_haplotype(alignments):
        """Group per-haplotype segments to their common window.

        Same grouping as the reference (``labels.py:170-234``): each
        anchor-haplotype segment collects, per other haplotype, the
        overlapping segment that covers most of the running window;
        every member is then trimmed to the window intersection.
        """
        logger = common.get_named_logger("Group_and_trim")
        haps = sorted(alignments, key=lambda h: (h is None, h))
        anchor, others = haps[0], haps[1:]
        if not others:
            return [(a,) for a in alignments[anchor]]
        index = {
            h: IntervalSet((a.start, a.end, a) for a in alignments[h])
            for h in others}
        groups = []
        for a in alignments[anchor]:
            lo, hi = a.start, a.end
            members = [a]
            for h in others:
                hits = index[h].overlap(lo, hi)
                if not hits:
                    logger.info(
                        "No haplotype-%s truth segment overlaps "
                        "%s:%d-%d; skipping the group.",
                        h, a.aln.ref_id, a.start, a.end)
                    break
                best = max(
                    hits,
                    key=lambda iv: min(hi, iv[1]) - max(lo, iv[0]))[2]
                lo = max(lo, best.start)
                hi = min(hi, best.end)
                members.append(best)
            else:
                for m in members:
                    m.start, m.end = lo, hi
                groups.append(tuple(members))
        return groups

    @staticmethod
    def bam_to_alignments(truth_bam, region, haplotag=None, min_length=1000):
        """Load, filter and group truth alignments for a region."""
        algns = TruthAlignment._load_alignments(truth_bam, region, haplotag)
        algns = {
            h: TruthAlignment._filter_alignments(
                h_algns, region=region, min_length=min_length)
            for h, h_algns in algns.items()}
        if len(algns) == 0:
            return []
        return TruthAlignment._group_and_trim_by_haplotype(algns)


# ---------------------------------------------------------------------------
# Label schemes
# ---------------------------------------------------------------------------

label_schemes = {}


class _SchemeMeta(abc.ABCMeta):
    def __new__(mcls, name, bases, attrs):
        cls = super().__new__(mcls, name, bases, attrs)
        if name != "BaseLabelScheme":
            label_schemes[name] = cls
        return cls


class BaseLabelScheme(metaclass=_SchemeMeta):
    """Logic for truth encoding and network-output decoding."""

    symbols = "*ACGT"
    verbose = True

    @property
    @abc.abstractmethod
    def n_elements(self):
        """Number of truth elements per position (~ploidy)."""

    @property
    @abc.abstractmethod
    def num_classes(self):
        """Size of the network output layer."""

    @property
    @abc.abstractmethod
    def padding_vector(self):
        """Encoded label marking a gap/insertion padding column."""

    def to_dict(self):
        """Serialise the scheme."""
        return {"type": self.__class__.__name__}

    @staticmethod
    def _singleton(it):
        return len(set(it)) == 1

    @staticmethod
    def _phred(err, cap=70.0):
        """Error probability to phred score, capped."""
        err = np.clip(err, 10 ** (-cap / 10.0), 1)
        return np.minimum(-10 * np.log10(err), cap)

    @staticmethod
    def _pfmt(p, dp=3):
        if isinstance(p, np.ndarray):
            return np.char.mod("%.{}f".format(dp), p)
        return "{:.{dp}f}".format(round(p, dp), dp=dp)

    # --- encoding ---

    @abc.abstractmethod
    def _alignment_to_pairs(self, aln):
        """Yield (ref_pos, label) pairs from an alignment record."""

    def _alignments_to_labels(self, truth_alns):
        """Expand truth alignments to ((major, minor) positions, labels)."""
        if len(truth_alns) != self.n_elements:
            raise ValueError(
                "{} alignments were passed to {}, requires {}".format(
                    len(truth_alns), type(self), self.n_elements))
        spans = {(a.start, a.end) for a in truth_alns}
        if len(spans) != 1:
            raise ValueError(
                "Alignments must have identical genomic start and end.")
        lo, hi = spans.pop()

        def keyed_symbols(aln):
            # ((major, minor), symbol) stream clipped to [lo, hi);
            # minor counts insertions after their anchoring major
            major, minor = None, 0
            for rpos, symbol in self._alignment_to_pairs(aln):
                if rpos is None:
                    if major is None:  # insertion before the window
                        continue
                    minor += 1
                elif rpos < lo:
                    continue
                elif rpos >= hi:
                    return
                else:
                    major, minor = rpos, 0
                yield (major, minor), symbol

        per_hap = [dict(keyed_symbols(a.aln)) for a in truth_alns]
        keys = sorted(set().union(*per_hap))
        labels = [tuple(h.get(k, "*") for h in per_hap) for k in keys]
        positions = np.array(keys, dtype=common.POSITIONS_DTYPE)
        return positions, labels

    @abc.abstractmethod
    def _labels_to_encoded_labels(self, labels):
        """Map label tuples to integer encodings."""

    @abc.abstractmethod
    def encoded_labels_to_training_vectors(self, enc_labels):
        """Map integer encodings to training target vectors."""

    @property
    @abc.abstractmethod
    def _encoding(self):
        """dict: label tuple -> integer."""

    @property
    @functools.lru_cache(1)
    def _decoding(self):
        """dict: integer -> label tuple."""
        return {v: k for k, v in self._encoding.items()}

    @property
    def _unitary_encoding(self):
        return {(s,): i for i, s in enumerate(self.symbols)}

    def _unordered_label_combinations(self):
        return tuple(itertools.combinations_with_replacement(
            self.symbols, self.n_elements))

    def encode(self, truth_alns):
        """Truth alignments -> (positions, encoded labels)."""
        positions, labels = self._alignments_to_labels(truth_alns)
        return positions, self._labels_to_encoded_labels(labels)

    # --- SNP decoding ---

    def decode_snps(self, sample, ref_seq, ref_vcf=None, threshold=0.04):
        """Decode network outputs into SNP `Variant` records."""
        self.ref_seq = ref_seq
        self.secondary_threshold = threshold
        self.ref_vcf = vcf.VCFReader(ref_vcf) if ref_vcf else None
        return self._decode_snps(sample)

    def _decode_snps(self, sample):
        ref_name = sample.ref_name
        pos = sample.positions
        probs = sample.label_probs
        if self.ref_vcf is not None:
            loci = {
                v.pos for v in self.ref_vcf.fetch(
                    ref_name=ref_name, start=sample.first_pos[0],
                    end=sample.last_pos[0])}
            return_all = True
        else:
            loci = None
            return_all = False
        indices, ref_symbols = [], []
        for i in range(len(probs)):
            major = pos["major"][i]
            reference_symbol = self.ref_seq[major]
            if pos["minor"][i] != 0 or reference_symbol not in self.symbols:
                continue
            if loci is not None and major not in loci:
                continue
            indices.append(i)
            ref_symbols.append(reference_symbol)
        return self._prob_to_snp(
            probs[indices], pos["major"][indices], ref_name, ref_symbols,
            return_all=return_all)

    @abc.abstractmethod
    def _prob_to_snp(self, outputs, positions, ref_name, ref_symbols,
                     return_all=False):
        """Convert network outputs at given loci to SNP records."""

    @property
    def snp_metainfo(self):
        """VCF header entries for SNP decoding."""
        MI = vcf.MetaInfo
        m = [MI("FORMAT", "GT", 1, "String", "Medaka genotype"),
             MI("FORMAT", "GQ", 1, "Integer",
                "Medaka genotype quality score")]
        if self.verbose:
            m.extend([
                MI("INFO", "ref_prob", 1, "Float",
                   "Medaka probability for reference allele"),
                MI("INFO", "primary_prob", 1, "Float",
                   "Medaka probability of primary call"),
                MI("INFO", "primary_call", 1, "String",
                   "Medaka primary call"),
                MI("INFO", "secondary_prob", 1, "Float",
                   "Medaka probability of secondary call"),
                MI("INFO", "secondary_call", 1, "String",
                   "Medaka secondary call")])
        return m


def find_variant_columns(minor, reference, prediction):
    """Mark pileup columns belonging to variant runs.

    A reference (minor==0) column is variant iff it differs; an insertion
    column is variant iff any column of its reference position differs.
    Vectorised equivalent of ``src/medaka_rnn_variants.c:28-55``.
    """
    minor = np.asarray(minor)
    if minor[0] != 0:
        raise ValueError(
            "minor array must contain 0 entry at index 0. Found: {}.".format(
                minor[0]))
    diff = np.asarray(reference) != np.asarray(prediction)
    group_starts = np.flatnonzero(minor == 0)
    group_any = np.logical_or.reduceat(diff, group_starts)
    group_id = np.cumsum(minor == 0) - 1
    return np.where(minor == 0, diff, group_any[group_id])


class HaploidLabelScheme(BaseLabelScheme):
    """Single truth element per position; 5-class softmax output."""

    @property
    def n_elements(self):
        """Ploidy (1)."""
        return 1

    @property
    def num_classes(self):
        """Output classes (5)."""
        return len(self._decoding)

    @property
    def padding_vector(self):
        """Gap encoding."""
        return self._labels_to_encoded_labels([("*",)])[0]

    @property
    @functools.lru_cache(1)
    def _encoding(self):
        return self._unitary_encoding

    def _alignment_to_pairs(self, aln):
        seq = aln.query_sequence
        for qpos, rpos in aln.get_aligned_pairs():
            yield rpos, seq[qpos].upper() if qpos is not None else "*"

    def _labels_to_encoded_labels(self, labels):
        return np.fromiter((self._encoding[x] for x in labels), dtype=int)

    def encoded_labels_to_training_vectors(self, enc_labels):
        """Integer encodings -> sparse one-hot targets."""
        if len(enc_labels.dtype) == 2:
            # legacy (base, runlength) encoding
            enc_labels = np.array(
                [max(0, x[0] - 4) for x in enc_labels], dtype="int64")
        return np.expand_dims(enc_labels, axis=1)

    def _prob_to_snp(self, outputs, positions, ref_name, ref_symbols,
                     return_all=False):
        """Threshold-based diploid-from-haploid SNP calling.

        Per locus the two highest-probability classes are inspected: a
        second call above ``secondary_threshold`` (and neither call a
        deletion) produces a heterozygous record; otherwise a non-ref,
        non-deletion top call produces a homozygous-alt record. Anything
        else is emitted as 0/0 only when ``return_all`` (gVCF mode).
        Behavioural parity target: reference ``labels.py:773-867``.
        """
        probs = np.asarray(outputs, dtype=float)
        if probs.size == 0:
            return []
        # per-locus class ranking, vectorised: [:, -1] best, [:, -2] runner-up
        ranked = np.argsort(probs, axis=1)
        top_idx, second_idx = ranked[:, -1], ranked[:, -2]
        rows = np.arange(len(probs))
        top_p, second_p = probs[rows, top_idx], probs[rows, second_idx]

        def make_record(pos, ref_symbol, alt, gt, err, info):
            q = self._phred(err)
            return vcf.Variant(
                ref_name, pos, ref_symbol, alt, filt="PASS", info=info,
                qual=self._pfmt(q),
                genotype_data={"GT": gt, "GQ": self._pfmt(q, 0)})

        results = []
        for i, (pos, ref_symbol) in enumerate(zip(positions, ref_symbols)):
            call = self._decoding[top_idx[i]][0]
            runner_up = self._decoding[second_idx[i]][0]
            p1, p2 = top_p[i], second_p[i]

            info = {}
            if self.verbose:
                ref_p = probs[i, self._encoding[(ref_symbol,)]]
                info = {
                    "ref_prob": self._pfmt(ref_p),
                    "primary_prob": self._pfmt(p1),
                    "primary_call": call,
                    "secondary_prob": self._pfmt(p2),
                    "secondary_call": runner_up}

            heterozygous = (
                p2 >= self.secondary_threshold
                and "*" not in (call, runner_up))
            if heterozygous:
                alt = [c for c in (call, runner_up) if c != ref_symbol]
                gt = "0/1" if ref_symbol in (call, runner_up) else "1/2"
                results.append(make_record(
                    pos, ref_symbol, alt, gt, 1.0 - (p1 + p2), info))
            elif call not in (ref_symbol, "*"):
                results.append(make_record(
                    pos, ref_symbol, call, "1/1", 1.0 - p1, info))
            elif return_all:
                results.append(make_record(
                    pos, ref_symbol, ".", "0/0", 1.0 - p1, info))
        return results

    def decode_variants(self, sample, ref_seq, ambig_ref=False,
                        return_all=False):
        """Consensus-vs-reference diffing into (multi-base) variants.

        Mirrors ``labels.py:889-1014``.
        """
        if sample.positions["minor"][0] != 0:
            raise ValueError(
                "The first position of a sample must not be an insertion.")
        pos = sample.positions
        probs = sample.label_probs
        encoding = self._encoding

        predicted = self.decode_consensus(sample, with_gaps=True, dtype="|U1")
        reference = np.full(len(pos), "*", dtype="|U1")
        reference[pos["minor"] == 0] = np.frombuffer(
            ref_seq[pos["major"][0]:pos["major"][-1] + 1].encode(),
            dtype="S1").astype("U1")
        is_variant = find_variant_columns(pos["minor"], reference, predicted)

        variants = []
        runs = common.rle(is_variant)
        for rlen, rstart, _ in runs[runs["value"]]:
            rend = rstart + rlen
            var_ref_with_gaps = "".join(reference[rstart:rend])
            var_pred_with_gaps = "".join(predicted[rstart:rend])
            var_ref = var_ref_with_gaps.replace("*", "")
            var_pred = var_pred_with_gaps.replace("*", "")

            if var_ref == var_pred:
                # del followed by ins can cancel out
                continue
            if not ambig_ref and not set(var_ref).issubset(set(self.symbols)):
                continue

            var_ref_encoded = (
                encoding[(s if s != "N" else "*",)]
                for s in var_ref_with_gaps)
            var_pred_encoded = (
                encoding[(s,)] for s in var_pred_with_gaps)
            var_probs = probs[rstart:rend]
            ref_probs = np.array(
                [var_probs[i, j] for i, j in enumerate(var_ref_encoded)])
            pred_probs = np.array(
                [var_probs[i, j] for i, j in enumerate(var_pred_encoded)])
            ref_quals = self._phred(1.0 - ref_probs)
            pred_quals = self._phred(1.0 - pred_probs)

            info = {}
            if self.verbose:
                info = {
                    "ref_seq": var_ref_with_gaps,
                    "pred_seq": var_pred_with_gaps,
                    "ref_qs": ",".join(self._pfmt(q) for q in ref_quals),
                    "pred_qs": ",".join(self._pfmt(q) for q in pred_quals),
                    "ref_q": self._pfmt(sum(ref_quals)),
                    "pred_q": self._pfmt(sum(pred_quals)),
                    "n_cols": len(pred_quals)}

            qual = sum(pred_quals) - sum(ref_quals)
            var_pos = pos["major"][rstart]
            if pos["minor"][rstart] != 0:
                # variant starting on an insert: prepend the reference base
                var_ref = ref_seq[var_pos] + var_ref
                var_pred = ref_seq[var_pos] + var_pred
            variant = vcf.Variant(
                sample.ref_name, var_pos, var_ref, alt=var_pred, filt="PASS",
                info=info, qual=self._pfmt(qual),
                genotype_data={"GT": "1", "GQ": self._pfmt(qual, 0)})
            variants.append(variant.normalize(reference=ref_seq))

        if return_all:
            sites = pos["minor"] == 0
            _pos = pos["major"][sites]
            _probs = probs[sites]
            _ref = reference[sites]
            _enc = [encoding[(s if s != "N" else "*",)] for s in _ref]
            _quals = self._phred(
                1.0 - np.array(_probs[np.arange(_probs.shape[0]), _enc]))
            for p, base, qf, qi in zip(
                    _pos, _ref, np.char.mod("%.3f", _quals),
                    np.char.mod("%d", np.rint(_quals))):
                variants.append(vcf.Variant(
                    sample.ref_name, p, base, alt=".", filt=".", info={},
                    qual=qf,
                    genotype_data=vcf.GenotypeData(GT="0", GQ=qi)))
            variants.sort(key=lambda x: x.pos)
        return variants

    @property
    def variant_metainfo(self):
        """VCF header entries for variant decoding."""
        MI = vcf.MetaInfo
        m = [MI("FORMAT", "GT", 1, "String", "Medaka genotype."),
             MI("FORMAT", "GQ", 1, "Integer",
                "Medaka genotype quality score")]
        if self.verbose:
            m.extend([
                MI("INFO", "ref_seq", 1, "String",
                   "Medaka reference sequence"),
                MI("INFO", "pred_seq", 1, "String",
                   "Medaka predicted sequence"),
                MI("INFO", "ref_qs", ".", "Float",
                   "Medaka quality score for reference"),
                MI("INFO", "pred_qs", ".", "Float",
                   "Medaka quality score for prediction"),
                MI("INFO", "ref_q", 1, "Float",
                   "Medaka per position quality score for reference"),
                MI("INFO", "pred_q", 1, "Float",
                   "Medaka per position quality score for prediction"),
                MI("INFO", "n_cols", 1, "Integer",
                   "Number of medaka pileup columns in variant call")])
        return m

    def decode_consensus(self, sample, with_gaps=False, dtype=None,
                         with_qualities=False):
        """Argmax decoding of network output into sequence (+ quals)."""
        mp = np.argmax(sample.label_probs, -1)
        if with_qualities:
            probs = np.take_along_axis(
                sample.label_probs, np.expand_dims(mp, -1), -1).squeeze(-1)
        if not with_gaps:
            mask = mp != self.symbols.index("*")
            mp = mp[mask]
        if dtype is None:
            decode = np.array([ord(x) for x in self.symbols], dtype="u1")
            seq = decode[mp].tobytes().decode()
        else:
            seq = np.fromiter(self.symbols, dtype=dtype)[mp]
        if with_qualities:
            if not with_gaps:
                probs = probs[mask]
            qual_string = (
                self._phred(1 - probs).astype("u1") + 33).tobytes().decode()
            return seq, qual_string
        return seq


class DiploidLabelScheme(BaseLabelScheme):
    """Two truth elements per position; 15-class direct diploid calling."""

    @property
    def n_elements(self):
        """Ploidy (2)."""
        return 2

    @property
    def num_classes(self):
        """Output classes (15 = C(5+1, 2))."""
        return len(self._decoding)

    @property
    def padding_vector(self):
        """Gap encoding."""
        return self._labels_to_encoded_labels([("*", "*")])[0]

    @property
    @functools.lru_cache(1)
    def _encoding(self):
        return {v: k for k, v in
                enumerate(self._unordered_label_combinations())}

    def _alignment_to_pairs(self, aln):
        seq = aln.query_sequence
        for qpos, rpos in aln.get_aligned_pairs():
            yield rpos, seq[qpos].upper() if qpos is not None else "*"

    def _labels_to_encoded_labels(self, labels):
        return np.fromiter(
            (self._encoding[tuple(sorted(x))] for x in labels), dtype=int)

    def encoded_labels_to_training_vectors(self, enc_labels):
        """Integer encodings -> sparse one-hot targets."""
        return np.expand_dims(enc_labels, axis=1)

    def _prob_to_snp(self, outputs, positions, ref_name, ref_symbols,
                     return_all=False):
        """Direct diploid genotype calling (``labels.py:1158-1230``)."""
        argmax = outputs.argmax(axis=1)
        probs = outputs[np.arange(outputs.shape[0]), argmax]
        quals = self._phred(1 - probs)
        results = []
        for network_output, amax, prob, qual, pos, ref_symbol in zip(
                outputs, argmax, probs, quals, positions, ref_symbols):
            call = self._decoding[amax]

            def _info(rs, p, c):
                if not self.verbose:
                    return {}
                rp = network_output[self._encoding[(rs, rs)]]
                return {"ref_prob": self._pfmt(rp), "prob": self._pfmt(p),
                        "call": c}

            if call == (ref_symbol, ref_symbol):
                if return_all:
                    results.append(vcf.Variant(
                        ref_name, pos, ref_symbol, alt=".", filt="PASS",
                        info=_info(ref_symbol, prob, call),
                        qual=self._pfmt(qual),
                        genotype_data={
                            "GT": "0/0", "GQ": self._pfmt(qual, 0)}))
                continue
            contains_deletion = "*" in call
            if not self._singleton(call):  # heterozygous
                if not contains_deletion:
                    alt = [s for s in call if s != ref_symbol]
                    gt = "0/1" if len(alt) == 1 else "1/2"
                    results.append(vcf.Variant(
                        ref_name, pos, ref_symbol, alt, filt="PASS",
                        info=_info(ref_symbol, prob, call),
                        qual=self._pfmt(qual),
                        genotype_data={"GT": gt, "GQ": self._pfmt(qual, 0)}))
                else:
                    nonref_nondel = [
                        s for s in call if s != ref_symbol and s != "*"]
                    if nonref_nondel:
                        alt = [s for s in call if s != "*"]
                        results.append(vcf.Variant(
                            ref_name, pos, ref_symbol, alt, filt="PASS",
                            info=_info(ref_symbol, prob, call),
                            qual=self._pfmt(qual),
                            genotype_data={
                                "GT": "1/1", "GQ": self._pfmt(qual, 0)}))
            elif not contains_deletion:  # homozygous alt
                results.append(vcf.Variant(
                    ref_name, pos, ref_symbol, call[0], filt="PASS",
                    info=_info(ref_symbol, prob, call),
                    qual=self._pfmt(qual),
                    genotype_data={"GT": "1/1", "GQ": self._pfmt(qual, 0)}))
        return results

    @property
    def snp_metainfo(self):
        """VCF header entries for diploid SNP decoding."""
        MI = vcf.MetaInfo
        m = [MI("FORMAT", "GT", 1, "String", "Medaka genotype"),
             MI("FORMAT", "GQ", 1, "Float",
                "Medaka genotype quality score")]
        if self.verbose:
            m.extend([
                MI("INFO", "ref_prob", 1, "Float",
                   "Medaka probability of reference"),
                MI("INFO", "prob", 1, "Float",
                   "Medaka probability of variant"),
                MI("INFO", "call", 1, "String", "Medaka variant call")])
        return m


class RLELabelScheme(HaploidLabelScheme):
    """Haploid labels over (base, run length) alphabet for RLE models."""

    def __init__(self, max_run=12):
        """Runs longer than ``max_run`` are clipped."""
        self.max_run = max_run

    def to_dict(self):
        """Serialise including max_run."""
        return {"type": self.__class__.__name__,
                "kwargs": {"max_run": self.max_run}}

    @property
    def padding_vector(self):
        """Gap encoding."""
        return self._labels_to_encoded_labels([(("*", 1),)])[0]

    @property
    @functools.lru_cache(1)
    def _encoding(self):
        encoding = {(("*", 1),): 0}
        bases = [s for s in self.symbols if s != "*"]
        for i, (b, l) in enumerate(
                itertools.product(bases, range(1, self.max_run + 1)), 1):
            encoding[((b, l),)] = i
        return encoding

    def _alignment_to_pairs(self, aln):
        seq = aln.query_sequence
        run_lengths = aln.query_qualities
        for qpos, rpos in aln.get_aligned_pairs():
            qbase = seq[qpos] if qpos is not None else "*"
            qlen = run_lengths[qpos] if qpos is not None else 1
            yield rpos, (qbase, min(qlen, self.max_run))

    def _labels_to_encoded_labels(self, labels):
        return np.fromiter((self._encoding[x] for x in labels), dtype=int)

    def decode_consensus(self, sample, with_qualities=False):
        """Argmax decode expanding run lengths.

        ``with_qualities`` makes RLE models stitchable: the expanded
        bases of a run all carry the phred of the run's class
        probability. (The reference's stitch crashes here — its
        RLE ``decode_consensus`` rejects the keyword,
        ``stitch.py:63`` vs ``labels.py:1301``.)
        """
        decode = self._decoding
        mp = np.argmax(sample.label_probs, -1)
        parts = []
        quals = []
        probs = None
        if with_qualities:
            probs = np.take_along_axis(
                sample.label_probs, mp[:, None], -1).squeeze(-1)
        for i, x in enumerate(mp):
            ((base, run),) = decode[x]
            if base == "*":
                continue
            parts.append(base * run)
            if with_qualities:
                q = int(self._phred(1.0 - probs[i])) + 33
                quals.append(chr(min(q, 126)) * run)
        seq = "".join(parts)
        if with_qualities:
            return seq, "".join(quals)
        return seq

    def _prob_to_snp(self, *args, **kwargs):
        """SNP decoding is undefined for RLE outputs."""
        raise NotImplementedError

    def decode_variants(self, *args, **kwargs):
        """Variant decoding is undefined for RLE outputs.

        (Attempting it in the reference dies with a TypeError inside
        the inherited ``decode_variants`` — ``labels.py:889`` calls
        ``decode_consensus(with_gaps=True)``, which its RLE scheme
        rejects; fail with a message instead.)
        """
        raise NotImplementedError(
            "Variant decoding is undefined for RLE models; polish and "
            "call variants with a non-RLE model instead.")
