// Long-read-to-draft mapper for medaka_tpu (host side).
//
// Replaces the reference's dependency on external minimap2/mini_align
// (scripts/medaka_consensus:165-176) for the polishing workflow: reads
// are mapped to the draft assembly with a minimizer index, colinear
// anchor chaining and banded affine extension between anchors.
//
// Scope: a "minimap2-lite" tuned for the polishing use case (reads are
// drawn from the assembly itself, so high identity, mostly unique
// placement). Primary mapping per read, both strands considered.

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

const int K = 15;        // k-mer size
const int W = 10;        // minimizer window
const uint64_t KMASK = (1ULL << (2 * K)) - 1;

inline int base_code(char c) {
    switch (c) {
        case 'A': case 'a': return 0;
        case 'C': case 'c': return 1;
        case 'G': case 'g': return 2;
        case 'T': case 't': return 3;
        default: return -1;
    }
}

inline uint64_t hash64(uint64_t key) {
    key = (~key + (key << 21)) & UINT64_MAX;
    key = key ^ (key >> 24);
    key = ((key + (key << 3)) + (key << 8));
    key = key ^ (key >> 14);
    key = ((key + (key << 2)) + (key << 4));
    key = key ^ (key >> 28);
    key = key + (key << 31);
    return key;
}

struct Minimizer {
    uint64_t hash;
    int pos;      // position of k-mer start
    bool rev;     // strand of canonical k-mer
};

// canonical minimizers of a sequence
void sketch(const char* seq, int len, std::vector<Minimizer>* out) {
    if (len < K) return;
    uint64_t fwd = 0, rev = 0;
    int valid = 0;
    std::vector<Minimizer> window_buf;
    std::vector<Minimizer> kmers;
    kmers.reserve(len);
    for (int i = 0; i < len; ++i) {
        int c = base_code(seq[i]);
        if (c < 0) {
            valid = 0;
            fwd = rev = 0;
            continue;
        }
        fwd = ((fwd << 2) | c) & KMASK;
        rev = (rev >> 2) | ((uint64_t)(3 - c) << (2 * (K - 1)));
        if (++valid < K) continue;
        bool is_rev = rev < fwd;
        uint64_t canon = is_rev ? rev : fwd;
        kmers.push_back({hash64(canon), i - K + 1, is_rev});
    }
    // window minima
    int n = (int)kmers.size();
    std::vector<char> taken(n, 0);
    for (int i = 0; i + W <= n; ++i) {
        int best = i;
        for (int j = i + 1; j < i + W; ++j)
            if (kmers[j].hash < kmers[best].hash) best = j;
        if (!taken[best]) {
            taken[best] = 1;
            out->push_back(kmers[best]);
        }
    }
    if (n > 0 && n < W) {  // short sequence: take global min
        int best = 0;
        for (int j = 1; j < n; ++j)
            if (kmers[j].hash < kmers[best].hash) best = j;
        out->push_back(kmers[best]);
    }
}

struct RefIndex {
    // hash -> list of (ref_id << 32 | pos), strand in low bit of pos<<1
    std::unordered_map<uint64_t, std::vector<uint64_t>> table;
    std::vector<std::string> names;
    std::vector<std::string> seqs;
    int max_occ = 64;  // drop ultra-repetitive seeds
};

struct Anchor {
    int rpos, qpos;
};

}  // namespace

extern "C" {

void* mt_index_create() { return new RefIndex(); }

void mt_index_add(void* handle, const char* name, const char* seq,
                  int len) {
    RefIndex* idx = static_cast<RefIndex*>(handle);
    int rid = (int)idx->seqs.size();
    idx->names.push_back(name);
    idx->seqs.emplace_back(seq, len);
    std::vector<Minimizer> mins;
    sketch(seq, len, &mins);
    for (const Minimizer& m : mins) {
        uint64_t val =
            ((uint64_t)rid << 33) | ((uint64_t)m.pos << 1) |
            (m.rev ? 1 : 0);
        idx->table[m.hash].push_back(val);
    }
}

void mt_index_destroy(void* handle) {
    delete static_cast<RefIndex*>(handle);
}

typedef struct {
    int32_t ref_id;
    int32_t ref_start;
    int32_t flag;        // 0 fwd, 16 rev, -1 unmapped
    int32_t score;
    int32_t query_start;  // soft-clip at start (of oriented query)
    int32_t query_end;
    char* cigar;          // aligned part only (no clips); mt_free()
} mt_mapping;

// forward declaration from align.cpp
typedef struct {
    int32_t score;
    int32_t ref_start;
    int32_t ref_end;
    int32_t query_start;
    int32_t query_end;
    char* cigar;
} mt_alignment;
int mt_align(const char* query, int qlen, const char* ref, int rlen,
             int match, int mismatch, int gap_open, int gap_extend,
             int mode, int band, mt_alignment* out);
void mt_free(void* p);

static void revcomp(const std::string& in, std::string* out) {
    out->resize(in.size());
    for (size_t i = 0; i < in.size(); ++i) {
        char c = in[in.size() - 1 - i];
        switch (c) {
            case 'A': case 'a': (*out)[i] = 'T'; break;
            case 'C': case 'c': (*out)[i] = 'G'; break;
            case 'G': case 'g': (*out)[i] = 'C'; break;
            case 'T': case 't': (*out)[i] = 'A'; break;
            default: (*out)[i] = 'N';
        }
    }
}

// Map one read: collect anchors per (ref, strand), pick the densest
// colinear chain, align the spanned segment with a banded NW.
int mt_map(void* handle, const char* qseq_c, int qlen, int band,
           mt_mapping* out) {
    RefIndex* idx = static_cast<RefIndex*>(handle);
    out->cigar = nullptr;
    out->flag = -1;
    if (qlen < K) return 0;
    std::string qseq(qseq_c, qlen);
    std::vector<Minimizer> qmins;
    sketch(qseq.c_str(), qlen, &qmins);

    // anchors keyed by (ref_id, orientation)
    std::unordered_map<uint64_t, std::vector<Anchor>> buckets;
    for (const Minimizer& m : qmins) {
        auto it = idx->table.find(m.hash);
        if (it == idx->table.end()) continue;
        if ((int)it->second.size() > idx->max_occ) continue;
        for (uint64_t val : it->second) {
            int rid = (int)(val >> 33);
            int rpos = (int)((val >> 1) & 0xffffffffULL);
            bool rrev = val & 1;
            bool orient_rev = (rrev != m.rev);  // read maps to - strand
            uint64_t key = ((uint64_t)rid << 1) | (orient_rev ? 1 : 0);
            buckets[key].push_back({rpos, m.pos});
        }
    }

    // choose best bucket by simple colinear chain length
    uint64_t best_key = 0;
    int best_chain = 0;
    int best_diag = 0;
    for (auto& kv : buckets) {
        auto& anchors = kv.second;
        bool orient_rev = kv.first & 1;
        // for reverse orientation, flip query coords so colinearity is
        // ascending in both axes
        std::vector<Anchor> a = anchors;
        if (orient_rev)
            for (Anchor& an : a) an.qpos = qlen - K - an.qpos;
        // histogram of diagonals; densest diagonal bundle approximates
        // the chain (adequate at polishing identity)
        std::unordered_map<int, int> diag_count;
        for (const Anchor& an : a)
            diag_count[(an.rpos - an.qpos) / 500]++;
        for (auto& dc : diag_count) {
            if (dc.second > best_chain) {
                best_chain = dc.second;
                best_key = kv.first;
                best_diag = dc.first;
            }
        }
    }
    if (best_chain < 3) return 0;  // unmapped

    int rid = (int)(best_key >> 1);
    bool orient_rev = best_key & 1;
    const std::string& ref = idx->seqs[rid];

    // gather anchors near the chosen diagonal bundle
    std::vector<Anchor> chain;
    for (Anchor an : buckets[best_key]) {
        int qp = orient_rev ? qlen - K - an.qpos : an.qpos;
        int d = (an.rpos - qp) / 500;
        if (std::abs(d - best_diag) <= 1)
            chain.push_back({an.rpos, qp});
    }
    if (chain.empty()) return 0;
    int rmin = chain[0].rpos, rmax = chain[0].rpos;
    int qmin = chain[0].qpos, qmax = chain[0].qpos;
    for (const Anchor& an : chain) {
        rmin = std::min(rmin, an.rpos);
        rmax = std::max(rmax, an.rpos);
        qmin = std::min(qmin, an.qpos);
        qmax = std::max(qmax, an.qpos);
    }
    qmax += K;
    rmax += K;

    // expand the reference window to cover the full query with margin
    int margin = band;
    int rstart = std::max(0, rmin - qmin - margin);
    int rend = std::min((int)ref.size(), rmax + (qlen - qmax) + margin);

    std::string oriented;
    if (orient_rev) revcomp(qseq, &oriented);
    const std::string& q = orient_rev ? oriented : qseq;

    mt_alignment aln;
    int rv = mt_align(
        q.c_str(), qlen, ref.c_str() + rstart, rend - rstart,
        2, 4, 4, 2, /*mode=SW*/ 2, band, &aln);
    if (rv != 0 || aln.cigar == nullptr) return 1;
    out->ref_id = rid;
    out->ref_start = rstart + aln.ref_start;
    out->flag = orient_rev ? 16 : 0;
    out->score = aln.score;
    out->query_start = aln.query_start;
    out->query_end = aln.query_end;
    out->cigar = aln.cigar;  // ownership to caller
    return 0;
}

}  // extern "C"
