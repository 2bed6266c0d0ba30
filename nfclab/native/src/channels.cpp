// Native box-channel builders.
//
// Single-pass double-precision running sums for the correlator channels
// (the numpy cumsum-diff formulation costs several full-array temporaries;
// these write the f32 result directly).  Semantics match dsp/channels.py:
// left zero padding (ring warm-up) and f64 accumulation.
//
// Every kernel has an `_ext` variant taking a `start` clock and (for the
// running sums) an in/out f64 accumulator so the streaming decoder can
// extend a channel over newly conditioned samples in O(block) while staying
// bit-identical to a fresh full-stream pass (the op sequence is the same).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// B[u] = sum x[max(0,u-w+1) .. u]
void nfclab_box_sum_ext(const float *x, int64_t n, int64_t start, int32_t w,
                        double *acc_io, float *out)
{
    double acc = *acc_io;
    for (int64_t i = start; i < n; i++) {
        acc += x[i];
        if (i >= w)
            acc -= x[i - w];
        out[i] = static_cast<float>(acc);
    }
    *acc_io = acc;
}

void nfclab_box_sum(const float *x, int64_t n, int32_t w, float *out)
{
    double acc = 0.0;
    nfclab_box_sum_ext(x, n, 0, w, &acc, out);
}

// box of q = filt^2 * 10 (listen ASK channel integrand)
void nfclab_box_sq_ext(const float *filt, int64_t n, int64_t start, int32_t w,
                       double *acc_io, float *out)
{
    double acc = *acc_io;
    for (int64_t i = start; i < n; i++) {
        const float q = filt[i] * filt[i] * 10.0f;
        acc += q;
        if (i >= w) {
            const float qo = filt[i - w] * filt[i - w] * 10.0f;
            acc -= qo;
        }
        out[i] = static_cast<float>(acc);
    }
    *acc_io = acc;
}

void nfclab_box_sq(const float *filt, int64_t n, int32_t w, float *out)
{
    double acc = 0.0;
    nfclab_box_sq_ext(filt, n, 0, w, &acc, out);
}

// box of prod = filt[i] * filt[i-lag] * 10 (BPSK integrand; zero below lag)
void nfclab_box_bpsk_ext(const float *filt, int64_t n, int64_t start,
                         int32_t lag, int32_t w, double *acc_io, float *out)
{
    double acc = *acc_io;
    for (int64_t i = start; i < n; i++) {
        const float p =
            (i >= lag) ? filt[i] * filt[i - lag] * 10.0f : 0.0f;
        acc += p;
        if (i >= w) {
            const int64_t j = i - w;
            const float po =
                (j >= lag) ? filt[j] * filt[j - lag] * 10.0f : 0.0f;
            acc -= po;
        }
        out[i] = static_cast<float>(acc);
    }
    *acc_io = acc;
}

void nfclab_box_bpsk(const float *filt, int64_t n, int32_t lag, int32_t w,
                     float *out)
{
    double acc = 0.0;
    nfclab_box_bpsk_ext(filt, n, 0, lag, w, &acc, out);
}

// Fused multi-channel box extension: extend K box channels over the new
// samples in ONE pass over the conditioned stream (the per-channel kernels
// above re-read `value`/`filtered` once per channel; with ~14 live channels
// the source re-reads dominate the streaming decoder's per-feed cost).
// Per-channel math is kept expression-identical to the individual kernels,
// so the extended arrays stay bit-identical to a fresh full-stream pass.
// kinds: 0 = sum(value), 1 = sq(filtered), 2 = bpsk(filtered, lag).
// Defined after run_box_group below: same-kind jobs sharing a start clock
// run as interleaved chain groups (the generic per-sample switch dispatch
// measured ~40% slower on whole-capture initial builds).
void nfclab_box_multi_ext(const float *value, const float *filt, int64_t n,
                          int32_t k, const int32_t *kinds,
                          const int32_t *widths, const int32_t *lags,
                          const int64_t *starts, double **accs, float **outs);

// Fused detect-channel builders: compute the dense SD correlation channel and
// collect threshold-crossing clock indices in one pass (replaces the numpy
// sd/mask/flatnonzero pipeline in demod/*.bind_channels, which costs several
// full-array temporaries).  All comparisons use the same f32 ops as the
// numpy formulation so the index sets are bit-identical.

// NFC-A / NFC-F detect SD: sd[t] = (S0 - S1)/p2 for t >= d+p1 (zero below),
// indices where env >= power_thr && |sd| > corr_thr*env, from t >= 1024.
// Returns the index count (indices written relative to the whole stream).
// sd_out may be NULL (index-only mode; the FSMs read SD on the fly from the
// box channel via fsm_sd_af/fsm_sd_v instead of a dense array).
// Sparse collect: append t = base_t + i for every set mask byte.  Hits are
// sparse (<1% typical), so the u64-at-a-time zero skip makes this pass
// nearly free; the predicate pass above it stays branch-free so the
// compiler can vectorize it (the old fused loops' data-dependent
// idx_out[count++] store blocked vectorization entirely).
static inline int64_t nfclab_collect_mask(const uint8_t *mask, int64_t m,
                                          int64_t base_t, int64_t *idx_out,
                                          int64_t count)
{
    int64_t i = 0;
    for (; i + 8 <= m; i += 8) {
        uint64_t w;
        memcpy(&w, mask + i, 8);
        if (!w)
            continue;
        for (int j = 0; j < 8; j++)
            if (mask[i + j])
                idx_out[count++] = base_t + i + j;
    }
    for (; i < m; i++)
        if (mask[i])
            idx_out[count++] = base_t + i;
    return count;
}

enum { NFCLAB_MASK_CHUNK = 4096 };

int64_t nfclab_detect_sd_af_ext(const float *box, const float *env,
                                int64_t n, int64_t start,
                                int32_t d, int32_t p1, int32_t p2,
                                float corr_thr, float power_thr,
                                float *sd_out, int64_t *idx_out)
{
    const int64_t lo = (int64_t)d + p1;
    const int64_t gap = p1 - p2;
    const float fp2 = (float)p2;
    int64_t count = 0;
    // warm-up region (zero-SD / pre-1024 gates): original scalar loop
    int64_t warm = lo > 1024 ? lo : 1024;
    if (warm > n)
        warm = n;
    int64_t t = start;
    for (; t < warm; t++) {
        float sd = 0.0f;
        if (t >= lo) {
            const int64_t u = t - d;
            const float a0 = box[u];
            const float a1 = box[u - gap];
            const float a2 = box[u - 1];
            sd = ((a0 - a1) - (a1 - a2)) / fp2;
        }
        if (sd_out)
            sd_out[t] = sd;
        if (t >= 1024 && env[t] >= power_thr &&
            (sd < 0.0f ? -sd : sd) > corr_thr * env[t])
            idx_out[count++] = t;
    }
    // hot region: branch-free predicate (identical float ops) + sparse
    // collect; bit-identical indices to the fused loop
    uint8_t mask[NFCLAB_MASK_CHUNK];
    while (t < n) {
        const int64_t m =
            (n - t) < NFCLAB_MASK_CHUNK ? (n - t) : NFCLAB_MASK_CHUNK;
        const float *b0 = box + (t - d);
        const float *b1 = box + (t - d - gap);
        const float *b2 = box + (t - d - 1);
        const float *e = env + t;
        for (int64_t i = 0; i < m; i++) {
            const float sd = ((b0[i] - b1[i]) - (b1[i] - b2[i])) / fp2;
            if (sd_out)
                sd_out[t + i] = sd;
            const float a = sd < 0.0f ? -sd : sd;
            mask[i] = (e[i] >= power_thr) & (a > corr_thr * e[i]);
        }
        count = nfclab_collect_mask(mask, m, t, idx_out, count);
        t += m;
    }
    return count;
}

int64_t nfclab_detect_sd_af(const float *box, const float *env, int64_t n,
                            int32_t d, int32_t p1, int32_t p2,
                            float corr_thr, float power_thr,
                            float *sd_out, int64_t *idx_out)
{
    return nfclab_detect_sd_af_ext(box, env, n, 0, d, p1, p2, corr_thr,
                                   power_thr, sd_out, idx_out);
}

// NFC-V detect SD: sd[t] = (B(t-d-gap) - B(t-d))/p2 for t >= d+p1,
// indices where env >= power_thr && sd > corr_thr*env (signed), t >= 1024.
int64_t nfclab_detect_sd_v_ext(const float *box, const float *env,
                               int64_t n, int64_t start,
                               int32_t d, int32_t p1, int32_t p2,
                               float corr_thr, float power_thr,
                               float *sd_out, int64_t *idx_out)
{
    const int64_t lo = (int64_t)d + p1;
    const int64_t gap = p1 - p2;
    const float fp2 = (float)p2;
    int64_t count = 0;
    int64_t warm = lo > 1024 ? lo : 1024;
    if (warm > n)
        warm = n;
    int64_t t = start;
    for (; t < warm; t++) {
        float sd = 0.0f;
        if (t >= lo) {
            const int64_t u = t - d;
            sd = (box[u - gap] - box[u]) / fp2;
        }
        if (sd_out)
            sd_out[t] = sd;
        if (t >= 1024 && env[t] >= power_thr && sd > corr_thr * env[t])
            idx_out[count++] = t;
    }
    uint8_t mask[NFCLAB_MASK_CHUNK];
    while (t < n) {
        const int64_t m =
            (n - t) < NFCLAB_MASK_CHUNK ? (n - t) : NFCLAB_MASK_CHUNK;
        const float *bg = box + (t - d - gap);
        const float *b0 = box + (t - d);
        const float *e = env + t;
        for (int64_t i = 0; i < m; i++) {
            const float sd = (bg[i] - b0[i]) / fp2;
            if (sd_out)
                sd_out[t + i] = sd;
            mask[i] = (e[i] >= power_thr) & (sd > corr_thr * e[i]);
        }
        count = nfclab_collect_mask(mask, m, t, idx_out, count);
        t += m;
    }
    return count;
}

int64_t nfclab_detect_sd_v(const float *box, const float *env, int64_t n,
                           int32_t d, int32_t p1, int32_t p2,
                           float corr_thr, float power_thr,
                           float *sd_out, int64_t *idx_out)
{
    return nfclab_detect_sd_v_ext(box, env, n, 0, d, p1, p2, corr_thr,
                                  power_thr, sd_out, idx_out);
}

// NFC-B falling-edge trigger mask: indices t >= 1024 where
// env >= power_thr && filt[t-d] < -(min_deep*env[t]) (zero below t < d).
int64_t nfclab_edge_mask_b_ext(const float *filt, const float *env,
                               int64_t n, int64_t start, int32_t d,
                               float min_deep, float power_thr,
                               int64_t *idx_out)
{
    int64_t count = 0;
    int64_t t = start > 1024 ? start : 1024;
    for (; t < n && t < d; t++) {  // shifted == 0 region (d > 1024 never
        if (env[t] >= power_thr && 0.0f < -(min_deep * env[t]))  // happens
            idx_out[count++] = t;                                // at 10MS/s)
    }
    uint8_t mask[NFCLAB_MASK_CHUNK];
    while (t < n) {
        const int64_t m =
            (n - t) < NFCLAB_MASK_CHUNK ? (n - t) : NFCLAB_MASK_CHUNK;
        const float *f = filt + (t - d);
        const float *e = env + t;
        for (int64_t i = 0; i < m; i++)
            mask[i] = (e[i] >= power_thr) & (f[i] < -(min_deep * e[i]));
        count = nfclab_collect_mask(mask, m, t, idx_out, count);
        t += m;
    }
    return count;
}

int64_t nfclab_edge_mask_b(const float *filt, const float *env, int64_t n,
                           int32_t d, float min_deep, float power_thr,
                           int64_t *idx_out)
{
    return nfclab_edge_mask_b_ext(filt, env, n, 0, d, min_deep, power_thr,
                                  idx_out);
}

// Generic threshold collectors: indices where x OP thr over [start, n).
int64_t nfclab_collect_gt_ext(const float *x, int64_t n, int64_t start,
                              float thr, int64_t *idx_out)
{
    int64_t count = 0;
    for (int64_t t = start; t < n; t++) {
        if (x[t] > thr)
            idx_out[count++] = t;
    }
    return count;
}

int64_t nfclab_collect_ge_ext(const float *x, int64_t n, int64_t start,
                              float thr, int64_t *idx_out)
{
    int64_t count = 0;
    for (int64_t t = start; t < n; t++) {
        if (x[t] >= thr)
            idx_out[count++] = t;
    }
    return count;
}

int64_t nfclab_collect_lt_ext(const float *x, int64_t n, int64_t start,
                              float thr, int64_t *idx_out)
{
    int64_t count = 0;
    for (int64_t t = start; t < n; t++) {
        if (x[t] < thr)
            idx_out[count++] = t;
    }
    return count;
}

// Rising-crossing collectors: indices t in [start, n) where (x[t] OP thr)
// holds and did not hold at t-1 (t == 0 counts when the condition holds).
// The carrier/power walkers only ever ask "next clock >= t where the
// condition holds"; pairing an O(1) direct test at t with these run-start
// indices keeps the index channels O(events) instead of O(samples) for
// conditions that are densely true (carrier-on covers most of a capture,
// NfcDecoder.cpp:472-523).  Callers guarantee x[start-1] is readable
// (windowed rescans restart at base+4096 > base).
#define NFCLAB_COLLECT_CROSS(NAME, COND)                                      \
    int64_t NAME(const float *x, int64_t n, int64_t start, float thr,        \
                 int64_t *idx_out)                                            \
    {                                                                         \
        int64_t count = 0;                                                    \
        uint8_t cond[NFCLAB_MASK_CHUNK];                                      \
        uint8_t hits[NFCLAB_MASK_CHUNK];                                      \
        uint8_t prev = start > 0 ? (uint8_t)(COND(x[start - 1])) : 0;         \
        int64_t t = start;                                                    \
        while (t < n) {                                                       \
            const int64_t m =                                                 \
                (n - t) < NFCLAB_MASK_CHUNK ? (n - t) : NFCLAB_MASK_CHUNK;    \
            const float *xp = x + t;                                          \
            for (int64_t i = 0; i < m; i++)                                   \
                cond[i] = (uint8_t)(COND(xp[i]));                             \
            hits[0] = cond[0] & (uint8_t)(prev ^ 1);                          \
            for (int64_t i = 1; i < m; i++)                                   \
                hits[i] = cond[i] & (uint8_t)(cond[i - 1] ^ 1);               \
            prev = cond[m - 1];                                               \
            count = nfclab_collect_mask(hits, m, t, idx_out, count);          \
            t += m;                                                           \
        }                                                                     \
        return count;                                                         \
    }

#define NFCLAB_GT(v) ((v) > thr)
#define NFCLAB_GE(v) ((v) >= thr)
#define NFCLAB_LT(v) ((v) < thr)
NFCLAB_COLLECT_CROSS(nfclab_collect_cross_gt_ext, NFCLAB_GT)
NFCLAB_COLLECT_CROSS(nfclab_collect_cross_ge_ext, NFCLAB_GE)
NFCLAB_COLLECT_CROSS(nfclab_collect_cross_lt_ext, NFCLAB_LT)
#undef NFCLAB_GT
#undef NFCLAB_GE
#undef NFCLAB_LT
#undef NFCLAB_COLLECT_CROSS

int64_t nfclab_collect_gt(const float *x, int64_t n, float thr,
                          int64_t *idx_out)
{
    return nfclab_collect_gt_ext(x, n, 0, thr, idx_out);
}

int64_t nfclab_collect_ge(const float *x, int64_t n, float thr,
                          int64_t *idx_out)
{
    return nfclab_collect_ge_ext(x, n, 0, thr, idx_out);
}

int64_t nfclab_collect_lt(const float *x, int64_t n, float thr,
                          int64_t *idx_out)
{
    return nfclab_collect_lt_ext(x, n, 0, thr, idx_out);
}

// ---- fused per-feed extension ---------------------------------------------
//
// One call extends EVERY registered channel entry over the newly conditioned
// samples: box running sums first, then index scans (the former derived
// channels are now computed on the fly by the FSMs — fsm_common.h).  Per-channel math is expression-identical to the
// single-channel kernels above, so the arrays/index sets stay bit-identical
// to the lazy per-channel extension path (and to a fresh full-stream pass).
//
// This replaces ~20 per-feed ctypes calls (each with pointer marshaling)
// with one, and keeps the feed tail of the source arrays cache-hot across
// the whole channel chain — the dominant fixed cost of streaming decode
// below ~1 MS blocks.

struct NfcFeedJob {
    int32_t kind;
    int32_t width;   // box width
    int32_t lag;     // box bpsk lag
    int32_t oa;      // derived offset a / idx d
    int32_t p1;      // idx p1
    int32_t ob;      // derived offset b / idx p2
    int32_t src;     // cond source selector (0 value, 1 env, 2 filt, 3 mdepth, 4 avg)
    int32_t pad;
    int64_t start;   // absolute clock to extend from (exclusive of history)
    int64_t lo;      // derived: zero below this clock
    float f0, f1;    // thresholds (corr/thr, power/min_deep)
    const float *in;
    float *out;
    double *acc;
    int64_t *idx_out;
    int64_t count;
};

enum {
    FX_BOX_SUM = 0, FX_BOX_SQ = 1, FX_BOX_BPSK = 2,
    FX_IDX_SD_AF = 3, FX_IDX_SD_V = 4, FX_IDX_EDGE_B = 5,
    FX_IDX_GT = 6, FX_IDX_GE = 7, FX_IDX_LT = 8,
    FX_X_GT = 9, FX_X_GE = 10, FX_X_LT = 11,
};

} // extern "C" (templates below have C++ linkage)

// K-way interleaved box extensions: each box channel is a serial f64
// running-sum chain (two dependent f64 adds per sample, ~8 cycles of pure
// latency); running channels one-at-a-time serializes those chains, while
// interleaving K independent channels in one loop lets the out-of-order core
// overlap them (~K-fold on the latency-bound part).  The per-channel op
// order (add new, then subtract old) is unchanged, so outputs stay
// bit-identical to the single-channel kernels.

template <int K>
static void box_sum_ext_k(const float *x, int64_t n, int64_t start,
                          const int32_t *w, double *const *accs,
                          float *const *outs)
{
    double acc[K];
    for (int c = 0; c < K; c++)
        acc[c] = *accs[c];
    for (int64_t i = start; i < n; i++) {
        const float xi = x[i];
        for (int c = 0; c < K; c++) {
            acc[c] += xi;
            if (i >= w[c])
                acc[c] -= x[i - w[c]];
            outs[c][i] = static_cast<float>(acc[c]);
        }
    }
    for (int c = 0; c < K; c++)
        *accs[c] = acc[c];
}

template <int K>
static void box_sq_ext_k(const float *filt, int64_t n, int64_t start,
                         const int32_t *w, double *const *accs,
                         float *const *outs)
{
    double acc[K];
    for (int c = 0; c < K; c++)
        acc[c] = *accs[c];
    for (int64_t i = start; i < n; i++) {
        const float q = filt[i] * filt[i] * 10.0f;
        for (int c = 0; c < K; c++) {
            acc[c] += q;
            if (i >= w[c]) {
                const float fo = filt[i - w[c]];
                acc[c] -= fo * fo * 10.0f;
            }
            outs[c][i] = static_cast<float>(acc[c]);
        }
    }
    for (int c = 0; c < K; c++)
        *accs[c] = acc[c];
}

template <int K>
static void box_bpsk_ext_k(const float *filt, int64_t n, int64_t start,
                           const int32_t *lag, const int32_t *w,
                           double *const *accs, float *const *outs)
{
    double acc[K];
    for (int c = 0; c < K; c++)
        acc[c] = *accs[c];
    for (int64_t i = start; i < n; i++) {
        for (int c = 0; c < K; c++) {
            const float p =
                (i >= lag[c]) ? filt[i] * filt[i - lag[c]] * 10.0f : 0.0f;
            acc[c] += p;
            if (i >= w[c]) {
                const int64_t j = i - w[c];
                const float po =
                    (j >= lag[c]) ? filt[j] * filt[j - lag[c]] * 10.0f : 0.0f;
                acc[c] -= po;
            }
            outs[c][i] = static_cast<float>(acc[c]);
        }
    }
    for (int c = 0; c < K; c++)
        *accs[c] = acc[c];
}

// Run every job of `kind` that shares start `s0` as interleaved groups of
// up to 4 chains.
static void run_box_group(int kind, const float *src, int64_t n, int64_t s0,
                          NfcFeedJob **grp, int m)
{
    int o = 0;
    while (m - o > 0) {
        int32_t w[4], lag[4];
        double *accs[4];
        float *outs[4];
        const int k = (m - o) >= 4 ? 4 : (m - o) >= 2 ? 2 : 1;
        for (int c = 0; c < k; c++) {
            w[c] = grp[o + c]->width;
            lag[c] = grp[o + c]->lag;
            accs[c] = grp[o + c]->acc;
            outs[c] = grp[o + c]->out;
        }
        switch (kind) {
        case FX_BOX_SUM:
            if (k == 4)
                box_sum_ext_k<4>(src, n, s0, w, accs, outs);
            else if (k == 2)
                box_sum_ext_k<2>(src, n, s0, w, accs, outs);
            else
                box_sum_ext_k<1>(src, n, s0, w, accs, outs);
            break;
        case FX_BOX_SQ:
            if (k == 4)
                box_sq_ext_k<4>(src, n, s0, w, accs, outs);
            else if (k == 2)
                box_sq_ext_k<2>(src, n, s0, w, accs, outs);
            else
                box_sq_ext_k<1>(src, n, s0, w, accs, outs);
            break;
        default:
            if (k == 4)
                box_bpsk_ext_k<4>(src, n, s0, lag, w, accs, outs);
            else if (k == 2)
                box_bpsk_ext_k<2>(src, n, s0, lag, w, accs, outs);
            else
                box_bpsk_ext_k<1>(src, n, s0, lag, w, accs, outs);
        }
        o += k;
    }
}

extern "C" {

void nfclab_feed_ext(const float *value, const float *filt, const float *env,
                     const float *mdepth, const float *avg,
                     int64_t n, int32_t njobs, NfcFeedJob *jobs)
{
    const float *srcs[5] = {value, env, filt, mdepth, avg};

    // phase 1: box running sums — same-kind channels sharing a start clock
    // run as interleaved chain groups (see box_*_ext_k); stragglers with a
    // different start (a channel created mid-stream) fall back to their
    // single-channel kernels
    enum { MAXJ = 64 };
    for (int kind = FX_BOX_SUM; kind <= FX_BOX_BPSK; kind++) {
        NfcFeedJob *grp[MAXJ];
        int m = 0;
        int64_t s0 = -1;
        for (int32_t j = 0; j < njobs; j++) {
            NfcFeedJob &job = jobs[j];
            if (job.kind != kind || job.start >= n)
                continue;
            if (s0 == -1)
                s0 = job.start;
            if (job.start == s0 && m < MAXJ) {
                grp[m++] = &job;
            } else {
                switch (kind) {
                case FX_BOX_SUM:
                    nfclab_box_sum_ext(value, n, job.start, job.width,
                                       job.acc, job.out);
                    break;
                case FX_BOX_SQ:
                    nfclab_box_sq_ext(filt, n, job.start, job.width,
                                      job.acc, job.out);
                    break;
                default:
                    nfclab_box_bpsk_ext(filt, n, job.start, job.lag,
                                        job.width, job.acc, job.out);
                }
            }
        }
        if (m)
            run_box_group(kind, kind == FX_BOX_SUM ? value : filt, n, s0,
                          grp, m);
    }

    // phase 2: index scans (same bodies as the *_ext collectors above)
    for (int32_t j = 0; j < njobs; j++) {
        NfcFeedJob &job = jobs[j];
        if (job.kind < FX_IDX_SD_AF || job.start >= n) {
            if (job.kind >= FX_IDX_SD_AF)
                job.count = 0;
            continue;
        }
        const int64_t start = job.start;
        int64_t *idx_out = job.idx_out;
        int64_t count = 0;
        switch (job.kind) {
        case FX_IDX_SD_AF:
            count = nfclab_detect_sd_af_ext(job.in, env, n, start, job.oa,
                                            job.p1, job.ob, job.f0, job.f1,
                                            nullptr, idx_out);
            break;
        case FX_IDX_SD_V:
            count = nfclab_detect_sd_v_ext(job.in, env, n, start, job.oa,
                                           job.p1, job.ob, job.f0, job.f1,
                                           nullptr, idx_out);
            break;
        case FX_IDX_EDGE_B:
            count = nfclab_edge_mask_b_ext(filt, env, n, start, job.oa,
                                           job.f0, job.f1, idx_out);
            break;
        case FX_IDX_GT:
            count = nfclab_collect_gt_ext(srcs[job.src], n, start, job.f0,
                                          idx_out);
            break;
        case FX_IDX_GE:
            count = nfclab_collect_ge_ext(srcs[job.src], n, start, job.f0,
                                          idx_out);
            break;
        case FX_IDX_LT:
            count = nfclab_collect_lt_ext(srcs[job.src], n, start, job.f0,
                                          idx_out);
            break;
        case FX_X_GT:
            count = nfclab_collect_cross_gt_ext(srcs[job.src], n, start,
                                                job.f0, idx_out);
            break;
        case FX_X_GE:
            count = nfclab_collect_cross_ge_ext(srcs[job.src], n, start,
                                                job.f0, idx_out);
            break;
        case FX_X_LT:
            count = nfclab_collect_cross_lt_ext(srcs[job.src], n, start,
                                                job.f0, idx_out);
            break;
        }
        job.count = count;
    }
}

// See the declaration near the top: K box channels in one call, grouped
// (kind, start) so equal groups run as interleaved chains (box_*_ext_k).
void nfclab_box_multi_ext(const float *value, const float *filt, int64_t n,
                          int32_t k, const int32_t *kinds,
                          const int32_t *widths, const int32_t *lags,
                          const int64_t *starts, double **accs, float **outs)
{
    enum { MAXK = 64 };
    if (k <= 0 || k > MAXK)
        return;
    NfcFeedJob jobs[MAXK];
    bool done[MAXK] = {};
    for (int32_t c = 0; c < k; c++) {
        jobs[c] = NfcFeedJob {};
        jobs[c].kind = kinds[c];
        jobs[c].width = widths[c];
        jobs[c].lag = lags[c];
        jobs[c].start = starts[c];
        jobs[c].acc = accs[c];
        jobs[c].out = outs[c];
    }
    for (int32_t c = 0; c < k; c++) {
        if (done[c])
            continue;
        NfcFeedJob *grp[MAXK];
        int m = 0;
        for (int32_t j = c; j < k; j++) {
            if (!done[j] && jobs[j].kind == jobs[c].kind &&
                jobs[j].start == jobs[c].start) {
                grp[m++] = &jobs[j];
                done[j] = true;
            }
        }
        const float *src = jobs[c].kind == FX_BOX_SUM ? value : filt;
        run_box_group(jobs[c].kind, src, n, jobs[c].start, grp, m);
    }
}

// k-way merge of sorted int64 arrays (the detect-candidate union: per-tech
// trigger indices + carrier run starts are each ascending).  Iterative
// pairwise std::merge passes between out and scratch — O(n log k) fully
// sequential, replacing the host's concatenate-copy + comparison sort.
// Duplicates are kept (harmless to the idle scan).  Result lands in out.
void nfclab_merge_sorted(const int64_t **srcs, const int64_t *lens,
                         int32_t k, int64_t *out, int64_t *scratch)
{
    if (k <= 0)
        return;
    // round 0 merges straight from the sources (no gather pass)
    std::vector<int64_t> off(1, 0);
    int64_t *a = out;
    int64_t *b = scratch;
    int32_t nseg = 0;
    {
        int64_t w = 0;
        for (int32_t i = 0; i < k; i += 2) {
            if (i + 1 < k)
                std::merge(srcs[i], srcs[i] + lens[i],
                           srcs[i + 1], srcs[i + 1] + lens[i + 1], a + w),
                    w += lens[i] + lens[i + 1];
            else
                std::copy(srcs[i], srcs[i] + lens[i], a + w), w += lens[i];
            off.push_back(w);
            nseg++;
        }
    }
    while (nseg > 1) {
        int32_t w = 0;
        std::vector<int64_t> noff(1, 0);
        for (int32_t i = 0; i < nseg; i += 2) {
            if (i + 1 < nseg) {
                std::merge(a + off[i], a + off[i + 1],
                           a + off[i + 1], a + off[i + 2], b + off[i]);
            } else {
                std::copy(a + off[i], a + off[i + 1], b + off[i]);
            }
            noff.push_back(off[std::min(i + 2, nseg)]);
            w++;
        }
        off = std::move(noff);
        std::swap(a, b);
        nseg = w;
    }
    if (a != out)
        std::copy(a, a + off[nseg], out);
}

} // extern "C"
