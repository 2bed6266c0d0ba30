// Native dirty-span detect stepper.
//
// The host event walker steps NFC-B/F/V per sample while they are
// mid-SoF-search ("dirty" spans, bounded but frequent under foreign-tech
// modulation).  This kernel executes those spans natively, reading the same
// dense arrays the Python FSMs read and mutating the same state (marshaled
// as flat double arrays).  Exact port of nfclab/demod/{nfcb,nfcf,nfcv}.py
// detect_step (themselves golden-exact transcriptions of tech/NfcB.cpp:238-432,
// tech/NfcF.cpp:206-408, tech/NfcV.cpp:236-435).
//
// Lock semantics: when any tech would lock at sample t, ALL states are
// restored to their pre-t snapshot and t is returned — the Python walker
// then re-executes sample t (applying the lock tail with full frame/context
// bookkeeping).  Returns -1 when the span completes without a lock.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>

#include "fsm_common.h"

namespace {

struct BState {
    double *st;          // [rates][M_FIELDS]
    const int32_t *par;  // [rates][P_FIELDS]
    int rates;
    float min_deep;
    float max_deep;
};

struct FState {
    double *st;
    const int32_t *par;
    const float *box[2];
    int rates;
    float corr_thr;
    float max_deep;
};

struct VState {
    double *st;  // single struct
    const int32_t *par;
    const float *box;
    float corr_thr;
    float min_deep;
    int32_t pulse_len_2bit;
    int32_t pulse_len_8bit;
};

inline void reset_fields(double *m, const int *idx, int count)
{
    for (int i = 0; i < count; i++)
        m[idx[i]] = 0.0;
}

// ---- NFC-B detect step (demod/nfcb.py detect_step; NfcB.cpp:238-432) ----
// returns rate index on lock, -1 otherwise
int step_b(BState &B, int64_t t, const float *env_a, const float *filt,
           const float *mdepth, float power_thr)
{
    const float env = env_a[t];
    if (t < 1024 || env < power_thr)
        return -1;

    for (int r = 0; r < B.rates; r++) {
        double *m = B.st + r * M_FIELDS;
        const int32_t *p = B.par + r * P_FIELDS;
        const int64_t d = p[P_D];
        const int64_t u = t - d;
        const float signal_edge = filt[u];
        const float signal_deep = mdepth[u];

        // recover (NfcB.cpp:265-274)
        if (signal_deep > B.max_deep ||
            (m[M_DET_PEAK_T] != 0.0 && t > (int64_t)m[M_DET_PEAK_T] + p[P_P1])) {
            static const int f[] = {M_SYM_START, M_SYM_END, M_SEARCH_START,
                                    M_SEARCH_END, M_SEARCH_SYNC,
                                    M_DET_PEAK_T, M_DET_PEAK_V};
            reset_fields(m, f, 7);
        }

        if (m[M_SYM_START] == 0.0) {
            m[M_VALUE_THR] = env * B.min_deep;
            const float thr = (float)m[M_VALUE_THR];
            if (signal_edge < -thr && signal_edge < (float)m[M_DET_PEAK_V]) {
                m[M_DET_PEAK_V] = signal_edge;
                m[M_DET_PEAK_T] = (double)t;
                m[M_SEARCH_END] = (double)(t + p[P_P4]);
            }
            if ((double)t != m[M_SEARCH_END])
                continue;
            m[M_SYM_START] = m[M_DET_PEAK_T] - p[P_P8];
            m[M_SEARCH_START] = m[M_SYM_START] + 10.0 * p[P_P1] - p[P_P2];
            m[M_SEARCH_END] = m[M_SYM_START] + 11.0 * p[P_P1] + p[P_P2];
            m[M_VALUE_THR] = std::fabs((float)m[M_DET_PEAK_V] * 0.5f);
            m[M_DET_PEAK_V] = 0.0;
            m[M_DET_PEAK_T] = 0.0;
            continue;
        }

        if (m[M_SYM_END] == 0.0) {
            const float thr = (float)m[M_VALUE_THR];
            if ((double)t < m[M_SEARCH_START]) {
                if (signal_edge > thr) {
                    static const int f[] = {M_SYM_START, M_SYM_END,
                                            M_SEARCH_START, M_SEARCH_END,
                                            M_DET_PEAK_T, M_DET_PEAK_V};
                    reset_fields(m, f, 6);
                }
                continue;
            }
            if (signal_edge > thr && signal_edge > (float)m[M_DET_PEAK_V]) {
                m[M_DET_PEAK_V] = signal_edge;
                m[M_DET_PEAK_T] = (double)t;
                m[M_SEARCH_END] = (double)(t + p[P_P4]);
            }
            if ((double)t != m[M_SEARCH_END])
                continue;
            if (m[M_DET_PEAK_T] == 0.0) {
                static const int f[] = {M_SYM_START, M_SYM_END,
                                        M_SEARCH_START, M_SEARCH_END,
                                        M_DET_PEAK_V};
                reset_fields(m, f, 5);
                continue;
            }
            m[M_SYM_END] = m[M_DET_PEAK_T];
            m[M_SEARCH_START] = m[M_DET_PEAK_T] + 2.0 * p[P_P1] - p[P_P2];
            m[M_SEARCH_END] = m[M_DET_PEAK_T] + 3.0 * p[P_P1] + p[P_P2];
            m[M_VALUE_THR] = std::fabs((float)m[M_DET_PEAK_V]) / 2;
            m[M_DET_PEAK_V] = 0.0;
            m[M_DET_PEAK_T] = 0.0;
            continue;
        }

        {
            const float thr = (float)m[M_VALUE_THR];
            if ((double)t < m[M_SEARCH_START]) {
                if (signal_edge < -thr) {
                    static const int f[] = {M_SYM_START, M_SYM_END,
                                            M_SEARCH_START, M_SEARCH_END,
                                            M_DET_PEAK_T, M_DET_PEAK_V};
                    reset_fields(m, f, 6);
                }
                continue;
            }
            if (signal_edge < -thr && (float)m[M_DET_PEAK_V] > signal_edge) {
                m[M_DET_PEAK_V] = signal_edge;
                m[M_DET_PEAK_T] = (double)t;
                m[M_SEARCH_END] = (double)(t + p[P_P4]);
            }
            if ((double)t != m[M_SEARCH_END])
                continue;
            if (m[M_DET_PEAK_T] == 0.0) {
                static const int f[] = {M_SYM_START, M_SYM_END,
                                        M_SEARCH_START, M_SEARCH_END,
                                        M_DET_PEAK_T, M_DET_PEAK_V};
                reset_fields(m, f, 6);
                break;  // NfcB.cpp:401 breaks the rate loop
            }
            return r;  // SoF complete: lock (tail executed by the caller)
        }
    }
    return -1;
}

// ---- NFC-F detect step (demod/nfcf.py detect_step; NfcF.cpp:206-408) ----
// F's correlation reads come from the half-symbol box channel (d = 0):
//   S0(t) = box[t] - box[t-gap],  S1(t) = box[t-gap] - box[t-1]
int step_f(FState &F, int64_t t, const float *env_a, const float *mdepth,
           float power_thr)
{
    const float env = env_a[t];
    if (t < 1024 || env < power_thr)
        return -1;
    const float min_corr = env * F.corr_thr;

    for (int r = 0; r < F.rates; r++) {
        double *m = F.st + r * M_FIELDS;
        const int32_t *p = F.par + r * P_FIELDS;
        const float *box = F.box[r];
        const int64_t gap = p[P_P1] - p[P_P2];
        const float sd =
            std::fabs(fsm_sd_af(box, t, 0, p[P_P1], p[P_P2]));
        const float signal_deep = mdepth[t];

        // recover (NfcF.cpp:260-271)
        if (signal_deep > F.max_deep ||
            (m[M_CORR_PEAK_T] != 0.0 &&
             t > (int64_t)m[M_CORR_PEAK_T] + p[P_P1])) {
            static const int f[] = {M_SYM_START, M_SYM_END, M_SEARCH_START,
                                    M_SEARCH_END, M_SEARCH_SYNC,
                                    M_DET_PEAK_T, M_DET_PEAK_V,
                                    M_CORR_PEAK_T, M_CORR_PEAK_V};
            reset_fields(m, f, 9);
        }

        if ((double)t < m[M_SEARCH_START])
            continue;

        if (sd > min_corr && sd > (float)m[M_CORR_PEAK_V]) {
            m[M_CORR_PEAK_V] = sd;
            m[M_CORR_PEAK_T] = (double)t;
            if (m[M_SEARCH_SYNC] == 0.0) {
                const float s0 = box[t] - box[t - gap];
                m[M_SYNC_VALUE] = sd;
                m[M_CORR0] = s0;
                m[M_SEARCH_END] = (double)(t + p[P_P8]);
            }
        }

        if ((double)t == m[M_SEARCH_SYNC]) {
            const float s0 = box[t] - box[t - gap];
            m[M_SYNC_VALUE] = sd;
            m[M_LAST_VALUE] = s0;
        }

        if ((double)t != m[M_SEARCH_END])
            continue;

        const double pw = m[M_PULSE_WIDTH];
        m[M_PULSE_WIDTH] = pw + 1.0;
        if (pw < 94.0) {
            if (m[M_CORR_PEAK_T] == 0.0 ||
                (float)m[M_SYNC_VALUE] < (float)m[M_VALUE_THR]) {
                static const int f[] = {M_SYM_START, M_SYM_END, M_SEARCH_SYNC,
                                        M_SYNC_VALUE, M_SEARCH_START,
                                        M_SEARCH_END, M_PULSE_WIDTH,
                                        M_VALUE_THR, M_CORR_PEAK_V,
                                        M_CORR_PEAK_T};
                reset_fields(m, f, 10);
                continue;
            }
        }

        if ((float)m[M_SYNC_VALUE] > (float)m[M_VALUE_THR]) {
            // continue preamble tracking (NfcF.cpp:331-351)
            if (m[M_SYM_START] == 0.0)
                m[M_SYM_START] = m[M_CORR_PEAK_T] - p[P_P2];
            m[M_SYM_END] = m[M_CORR_PEAK_T];
            m[M_SEARCH_SYNC] = m[M_SYM_END] + p[P_P2];
            m[M_SEARCH_START] = m[M_SEARCH_SYNC] - p[P_P8];
            m[M_SEARCH_END] = m[M_SEARCH_SYNC] + p[P_P8];
            m[M_VALUE_THR] = (float)m[M_CORR_PEAK_V] / 2;
            m[M_LAST_PHASE] = m[M_LAST_VALUE];
            m[M_CORR_PEAK_T] = 0.0;
            m[M_CORR_PEAK_V] = 0.0;
            continue;
        }

        // polarity compensation (NfcF.cpp:354-355)
        if (((float)m[M_LAST_PHASE] < 0 && (float)m[M_CORR0] < 0) ||
            ((float)m[M_LAST_PHASE] > 0 && (float)m[M_CORR0] > 0))
            m[M_SYM_START] -= p[P_P2];

        const double plen = m[M_SYM_END] - m[M_SYM_START];
        if (plen < (double)(p[P_PRE1] - p[P_P4]) ||
            plen > (double)(p[P_PRE1] + p[P_P4])) {
            static const int f[] = {M_SYM_START, M_SYM_END, M_SEARCH_SYNC,
                                    M_SYNC_VALUE, M_SEARCH_START,
                                    M_SEARCH_END, M_PULSE_WIDTH, M_VALUE_THR,
                                    M_CORR_PEAK_V, M_CORR_PEAK_T};
            reset_fields(m, f, 10);
            continue;
        }

        return r;  // preamble complete: lock (tail executed by the caller)
    }
    return -1;
}

// ---- NFC-V detect step (demod/nfcv.py detect_step; NfcV.cpp:236-435) ----
int step_v(VState &V, int64_t t, const float *env_a, const float *value,
           const float *mdepth, float power_thr)
{
    const float env = env_a[t];
    if (t < 1024 || env < power_thr)
        return -1;
    double *m = V.st;
    const int32_t *p = V.par;
    const float min_corr = env * V.corr_thr;
    const float s0 = fsm_sd_v(V.box, t, p[P_D], p[P_P1], p[P_P2]);
    const float signal_deep = mdepth[t - p[P_D] - p[P_P8]];

    if (m[M_CORR_PEAK_T] != 0.0 &&
        t > (int64_t)m[M_CORR_PEAK_T] + p[P_P0]) {
        static const int f[] = {M_SYM_START, M_SYM_END, M_SEARCH_START,
                                M_SEARCH_END, M_SEARCH_SYNC,
                                M_DET_PEAK_T, M_DET_PEAK_V,
                                M_CORR_PEAK_T, M_CORR_PEAK_V};
        reset_fields(m, f, 9);
    }

    if ((double)t < m[M_SEARCH_START])
        return -1;

    if (s0 > min_corr) {
        if (s0 > (float)m[M_CORR_PEAK_V]) {
            m[M_CORR_PEAK_V] = s0;
            m[M_CORR_PEAK_T] = (double)t;
            m[M_SEARCH_END] = (double)(t + p[P_P4]);
        }
        if (signal_deep > (float)m[M_DET_PEAK_V]) {
            m[M_DET_PEAK_V] = signal_deep;
            m[M_DET_PEAK_T] = (double)t;
        }
    }

    if ((double)t != m[M_SEARCH_END])
        return -1;

    const float signal_data = value[t - p[P_D]];
    if (signal_data < min_corr || m[M_CORR_PEAK_T] == 0.0 ||
        (float)m[M_DET_PEAK_V] < V.min_deep) {
        static const int f[] = {M_SYM_START, M_SYM_END, M_SEARCH_START,
                                M_SEARCH_END, M_CORR_PEAK_T, M_CORR_PEAK_V,
                                M_DET_PEAK_T, M_DET_PEAK_V};
        reset_fields(m, f, 8);
        return -1;
    }

    if (m[M_SYM_START] == 0.0) {
        m[M_SYM_START] = m[M_CORR_PEAK_T] - p[P_P2];
        m[M_SEARCH_START] = m[M_SYM_START] + 2.0 * p[P_P1];
        m[M_SEARCH_END] = m[M_SYM_START] + 4.0 * p[P_P1];
        m[M_CORR_PEAK_T] = 0.0;
        m[M_CORR_PEAK_V] = 0.0;
        m[M_DET_PEAK_T] = 0.0;
        m[M_DET_PEAK_V] = 0.0;
        return -1;
    }

    return 200;  // second pulse: code discrimination + lock tail in Python
}

// ---- NFC-A detect step (demod/nfca.py detect_step; NfcA.cpp:217-411) ----
struct AState {
    double *st;          // [3][M_FIELDS]
    const int32_t *par;  // [3][P_FIELDS]
    const float *box[3];
    float corr_thr;
    float min_deep;
};

int step_a(AState &A, int64_t t, const float *env_a, const float *mdepth,
           float power_thr)
{
    const float env = env_a[t];
    if (t < 1024 || env < power_thr)
        return -1;
    const float min_corr = env * A.corr_thr;

    for (int r = 0; r < 3; r++) {
        double *m = A.st + r * M_FIELDS;
        const int32_t *p = A.par + r * P_FIELDS;
        const float sd =
            fsm_sd_af(A.box[r], t, p[P_D], p[P_P1], p[P_P2]);

        // recover (NfcA.cpp:268-279)
        if (m[M_CORR_PEAK_T] != 0.0 &&
            t > (int64_t)m[M_CORR_PEAK_T] + p[P_P1]) {
            static const int f[] = {M_SYM_START, M_SYM_END, M_SEARCH_START,
                                    M_SEARCH_END, M_SEARCH_SYNC,
                                    M_DET_PEAK_T, M_DET_PEAK_V,
                                    M_CORR_PEAK_T, M_CORR_PEAK_V};
            reset_fields(m, f, 9);
        }

        if ((double)t < m[M_SEARCH_START])
            continue;

        if (m[M_SYM_START] == 0.0) {
            const float deep = mdepth[t - p[P_D] - p[P_P8]];
            if (sd < -min_corr) {
                if (sd < (float)m[M_CORR_PEAK_V]) {
                    m[M_CORR_PEAK_V] = sd;
                    m[M_CORR_PEAK_T] = (double)t;
                    m[M_SEARCH_END] = (double)(t + p[P_P4]);
                }
                if (deep > (float)m[M_DET_PEAK_V]) {
                    m[M_DET_PEAK_V] = deep;
                    m[M_DET_PEAK_T] = (double)t;
                }
            }
        } else {
            if (sd > min_corr && sd > (float)m[M_CORR_PEAK_V]) {
                m[M_CORR_PEAK_V] = sd;
                m[M_CORR_PEAK_T] = (double)t;
            }
        }

        if ((double)t != m[M_SEARCH_END])
            continue;

        if (m[M_SYM_START] == 0.0) {
            if ((float)m[M_DET_PEAK_V] < A.min_deep) {
                static const int f[] = {M_SYM_START, M_SYM_END, M_SEARCH_SYNC,
                                        M_SEARCH_START, M_SEARCH_END,
                                        M_PULSE_WIDTH, M_CORR_PEAK_T,
                                        M_CORR_PEAK_V, M_DET_PEAK_T,
                                        M_DET_PEAK_V};
                reset_fields(m, f, 10);
                continue;
            }
            m[M_SEARCH_SYNC] = m[M_CORR_PEAK_T] + p[P_P2];
            m[M_SEARCH_START] = m[M_SEARCH_SYNC] - p[P_P8];
            m[M_SEARCH_END] = m[M_SEARCH_SYNC] + p[P_P8];
            m[M_SYM_START] = m[M_CORR_PEAK_T] - p[P_P2];
            m[M_CORR_PEAK_T] = 0.0;
            m[M_CORR_PEAK_V] = 0.0;
            continue;
        }

        // pulse measured (NfcA.cpp:352-378): reset applied natively, the
        // lock path deferred to the caller (snapshot restore + re-execute)
        const double sym_end = m[M_CORR_PEAK_T];
        const double width = sym_end - m[M_SYM_START];
        const double min_w = (double)(p[P_P1] - p[P_P4]);
        const double max_w = (double)(p[P_P1] + p[P_P4]);
        if (m[M_CORR_PEAK_T] == 0.0 || (float)m[M_DET_PEAK_V] < A.min_deep ||
            width < min_w || width > max_w) {
            m[M_SYM_END] = sym_end;
            m[M_PULSE_WIDTH] = width;
            static const int f[] = {M_SYM_START, M_SYM_END, M_SEARCH_SYNC,
                                    M_SEARCH_START, M_SEARCH_END,
                                    M_PULSE_WIDTH, M_CORR_PEAK_T,
                                    M_CORR_PEAK_V, M_DET_PEAK_T,
                                    M_DET_PEAK_V};
            reset_fields(m, f, 10);
            continue;
        }
        return r;  // modulation lock: defer to Python
    }
    return -1;
}

// ---- idle fast path ------------------------------------------------------
//
// Between frames every rate-FSM sits in its zero state, where a detect step
// can only mutate state when its engage condition fires (verified against
// each step function above: all other writes are no-op zero stores or are
// gated by the nonzero fields this predicate requires to be zero; NFC-B's
// per-sample value-threshold store is dead — every consumer recomputes it
// from env[t] before reading).  The walk therefore scans forward with the
// branch-free trigger test below (same arrays, same f32 op order as the
// step functions, so bit-identical decisions) and re-enters per-sample
// stepping only at trigger samples.  Visiting extra samples is always safe;
// skipping is only done while provably idle.

inline bool rate_is_idle(const double *m)
{
    return m[M_SYM_START] == 0.0 && m[M_SYM_END] == 0.0 &&
           m[M_SEARCH_START] == 0.0 && m[M_SEARCH_END] == 0.0 &&
           m[M_SEARCH_SYNC] == 0.0 && m[M_CORR_PEAK_T] == 0.0 &&
           m[M_CORR_PEAK_V] == 0.0 && m[M_DET_PEAK_T] == 0.0 &&
           m[M_DET_PEAK_V] == 0.0;
}

struct IdleScan {
    const float *env, *filt, *avg;
    float power_thr;
    bool watch_on, watch_off;  // carrier crossings still pending
    float low_thr, high_thr;
    int a_on, b_on, f_on, v_on;
    const AState *A;
    const BState *B;
    const FState *F;
    const VState *V;

    // first t in [t0, t1) where any engage condition (or carrier crossing)
    // can fire; t1 if none
    int64_t scan(int64_t t0, int64_t t1) const
    {
        for (int64_t t = t0; t < t1; t++) {
            const float a = avg[t];
            if (watch_on && a > high_thr)
                return t;
            if (watch_off && a < low_thr)
                return t;
            if (t < 1024)
                continue;
            const float e = env[t];
            if (e < power_thr)
                continue;
            if (a_on) {
                const float min_corr = e * A->corr_thr;
                for (int r = 0; r < 3; r++) {
                    const int32_t *p = A->par + r * P_FIELDS;
                    if (fsm_sd_af(A->box[r], t, p[P_D], p[P_P1], p[P_P2]) <
                        -min_corr)
                        return t;
                }
            }
            if (b_on) {
                for (int r = 0; r < B->rates; r++) {
                    const int32_t *p = B->par + r * P_FIELDS;
                    if (filt[t - p[P_D]] < -(e * B->min_deep))
                        return t;
                }
            }
            if (f_on) {
                const float min_corr = e * F->corr_thr;
                for (int r = 0; r < F->rates; r++) {
                    const int32_t *p = F->par + r * P_FIELDS;
                    const float sd = std::fabs(
                        fsm_sd_af(F->box[r], t, 0, p[P_P1], p[P_P2]));
                    if (sd > min_corr)
                        return t;
                }
            }
            if (v_on) {
                const int32_t *p = V->par;
                if (fsm_sd_v(V->box, t, p[P_D], p[P_P1], p[P_P2]) >
                    e * V->corr_thr)
                    return t;
            }
        }
        return t1;
    }
};

// walk observability: samples skipped by the idle scan vs stepped through
// the full state machines (rt::Throughput-style counters; read via
// nfclab_detect_stats)
std::atomic<int64_t> g_idle_skipped {0};
std::atomic<int64_t> g_stepped {0};

} // namespace

extern "C" {

void nfclab_detect_stats(int64_t *skipped, int64_t *stepped)
{
    *skipped = g_idle_skipped.load(std::memory_order_relaxed);
    *stepped = g_stepped.load(std::memory_order_relaxed);
}

// Full native detect walk: carrier crossings + all four techs per sample.
// Stops (with snapshot restore) at any sample needing Python handling:
// carrier crossing events, tech locks.  Returns that clock, or -1 at t1.
//
// Rollback is checkpoint + replay: state snapshots are taken every
// SNAP_EVERY samples (not per sample — the copies were the dominant cost of
// the walk); on a hit at t the states are restored to the last checkpoint
// and re-stepped deterministically to t-1, leaving exactly the pre-t state.
static const int64_t SNAP_EVERY = 64;

int64_t nfclab_detect_all(
    int64_t t0, int64_t t1,
    const float *env, const float *filt, const float *mdepth,
    const float *value, const float *avg, float power_thr,
    // carrier
    int carrier_on_time, int carrier_off_time, float low_thr, float high_thr,
    // A
    int a_on, const int32_t *a_par, double *a_st,
    const float *a_box0, const float *a_box1, const float *a_box2,
    float a_corr_thr, float a_min_deep,
    // B
    int b_on, const int32_t *b_par, double *b_st, int b_rates,
    float b_min_deep, float b_max_deep,
    // F
    int f_on, const int32_t *f_par, double *f_st, int f_rates,
    const float *f_box0, const float *f_box1,
    float f_corr_thr, float f_max_deep,
    // V
    int v_on, const int32_t *v_par, double *v_st, const float *v_box,
    float v_corr_thr, float v_min_deep,
    // optional candidate union (sorted ascending clocks): every sample
    // where any tech engage condition can fire (device/preloaded detect
    // masks, conservative supersets) plus every carrier-crossing run start.
    // When present, the idle fast path binary-searches here instead of
    // re-deriving engage conditions per sample.
    const int64_t *cand, int64_t cand_n)
{
    AState A {a_st, a_par, {a_box0, a_box1, a_box2}, a_corr_thr, a_min_deep};
    BState B {b_st, b_par, b_rates, b_min_deep, b_max_deep};
    FState F {f_st, f_par, {f_box0, f_box1}, f_rates,
              f_corr_thr, f_max_deep};
    VState V {v_st, v_par, v_box, v_corr_thr, v_min_deep, 0, 0};

    double snap_a[3 * M_FIELDS];
    double snap_b[2 * M_FIELDS];
    double snap_f[2 * M_FIELDS];
    double snap_v[M_FIELDS];
    int64_t snap_t = t0;

    const auto save = [&] {
        if (a_on)
            std::memcpy(snap_a, a_st, sizeof(snap_a));
        if (b_on)
            std::memcpy(snap_b, b_st, sizeof(double) * b_rates * M_FIELDS);
        if (f_on)
            std::memcpy(snap_f, f_st, sizeof(double) * f_rates * M_FIELDS);
        if (v_on)
            std::memcpy(snap_v, v_st, sizeof(snap_v));
    };
    const auto restore = [&] {
        if (a_on)
            std::memcpy(a_st, snap_a, sizeof(snap_a));
        if (b_on)
            std::memcpy(b_st, snap_b, sizeof(double) * b_rates * M_FIELDS);
        if (f_on)
            std::memcpy(f_st, snap_f, sizeof(double) * f_rates * M_FIELDS);
        if (v_on)
            std::memcpy(v_st, snap_v, sizeof(snap_v));
    };
    const auto step_all = [&](int64_t t) -> int {
        if (a_on && step_a(A, t, env, mdepth, power_thr) >= 0)
            return 0;
        if (b_on && step_b(B, t, env, filt, mdepth, power_thr) >= 0)
            return 1;
        if (f_on && step_f(F, t, env, mdepth, power_thr) >= 0)
            return 2;
        if (v_on && step_v(V, t, env, value, mdepth, power_thr) >= 0)
            return 3;
        return -1;
    };

    const auto all_idle = [&]() -> bool {
        if (a_on)
            for (int r = 0; r < 3; r++)
                if (!rate_is_idle(a_st + r * M_FIELDS))
                    return false;
        if (b_on)
            for (int r = 0; r < b_rates; r++)
                if (!rate_is_idle(b_st + r * M_FIELDS))
                    return false;
        if (f_on)
            for (int r = 0; r < f_rates; r++)
                if (!rate_is_idle(f_st + r * M_FIELDS))
                    return false;
        if (v_on && !rate_is_idle(v_st))
            return false;
        return true;
    };
    const IdleScan scan {env, filt, avg, power_thr,
                         carrier_on_time == 0, carrier_off_time == 0,
                         low_thr, high_thr, a_on, b_on, f_on, v_on,
                         &A, &B, &F, &V};

    save();
    bool try_idle = true;
    int64_t idle_probe_at = t0;
    int64_t n_skipped = 0, n_stepped = 0;
    // flush the local counters into the globals exactly once per call (a
    // per-sample atomic RMW in this loop would serialize the hot path)
    struct Flush {
        int64_t *sk, *st;
        ~Flush()
        {
            g_idle_skipped.fetch_add(*sk, std::memory_order_relaxed);
            g_stepped.fetch_add(*st, std::memory_order_relaxed);
        }
    } flush {&n_skipped, &n_stepped};
    for (int64_t t = t0; t < t1; t++) {
        // idle fast path: when every rate-FSM is in its zero state the next
        // possible state change is the next engage-condition sample — jump
        // via the precomputed candidate union when available (O(log n)),
        // else scan branch-free instead of stepping the full state machines
        if (cand_n > 0) {
            // probe back-off: while engaged, re-evaluating all_idle() per
            // sample costs ~tens of loads; probing every 32 samples only
            // delays the next jump by <32 safe extra steps (visiting extra
            // samples is always allowed)
            if (t < idle_probe_at) {
                // fall through to the per-sample carrier test + stepping
            } else if (!all_idle()) {
                idle_probe_at = t + 32;
            } else {
                // the union holds tech engage candidates and carrier run
                // STARTS; a run containing t needs the direct test here
                // (CarrierDetector._next_interesting_compute semantics)
                const float a0 = avg[t];
                const bool carrier_now =
                    (carrier_on_time == 0 && a0 > high_thr) ||
                    (carrier_off_time == 0 && a0 < low_thr);
                if (!carrier_now) {
                    const int64_t *lo =
                        std::lower_bound(cand, cand + cand_n, t);
                    const int64_t nt = lo == cand + cand_n ? t1 : *lo;
                    if (nt > t) {
                        n_skipped += nt - t;
                        t = nt;
                        snap_t = nt;
                        save();
                        if (t >= t1)
                            break;
                    }
                }
            }
        } else if (try_idle && all_idle()) {
            const int64_t nt = scan.scan(t, t1);
            if (nt > t) {
                // no state changed over the skip; re-anchor the replay base
                n_skipped += nt - t;
                t = nt;
                snap_t = nt;
                save();
                if (t >= t1)
                    break;
            }
            try_idle = false;  // recheck at the next snapshot boundary
        }

        // carrier hysteresis crossing (NfcDecoder.cpp:472-523): rare; the
        // event itself (frame emit + state flip) runs in Python
        const float a = avg[t];
        if ((carrier_on_time == 0 && a > high_thr) ||
            (carrier_off_time == 0 && a < low_thr))
            return t;

        if (t - snap_t >= SNAP_EVERY) {
            save();
            snap_t = t;
            try_idle = true;
        }

        n_stepped++;
        if (step_all(t) >= 0) {
            restore();
            for (int64_t u = snap_t; u < t; u++)
                step_all(u);
            return t;
        }
    }
    return -1;
}

// Steps samples [t0, t1) for the enabled dirty techs (B before F before V —
// the walker's tech order).  On any "interesting" outcome (lock or a sample
// the native port defers), restores all states to the pre-sample snapshot
// and returns that sample's clock; returns -1 when the span completes.
int64_t nfclab_detect_span(
    int64_t t0, int64_t t1,
    const float *env, const float *filt, const float *mdepth,
    const float *value, float power_thr,
    int b_on, const int32_t *b_par, double *b_st, int b_rates,
    float b_min_deep, float b_max_deep,
    int f_on, const int32_t *f_par, double *f_st, int f_rates,
    const float *f_box0, const float *f_box1,
    float f_corr_thr, float f_max_deep,
    int v_on, const int32_t *v_par, double *v_st, const float *v_box,
    float v_corr_thr, float v_min_deep)
{
    BState B {b_st, b_par, b_rates, b_min_deep, b_max_deep};
    FState F {f_st, f_par, {f_box0, f_box1}, f_rates,
              f_corr_thr, f_max_deep};
    VState V {v_st, v_par, v_box, v_corr_thr, v_min_deep, 0, 0};

    double snap_b[2 * M_FIELDS];
    double snap_f[2 * M_FIELDS];
    double snap_v[M_FIELDS];
    int64_t snap_t = t0;

    const auto save = [&] {
        if (b_on)
            std::memcpy(snap_b, b_st, sizeof(double) * b_rates * M_FIELDS);
        if (f_on)
            std::memcpy(snap_f, f_st, sizeof(double) * f_rates * M_FIELDS);
        if (v_on)
            std::memcpy(snap_v, v_st, sizeof(double) * M_FIELDS);
    };
    const auto restore = [&] {
        if (b_on)
            std::memcpy(b_st, snap_b, sizeof(double) * b_rates * M_FIELDS);
        if (f_on)
            std::memcpy(f_st, snap_f, sizeof(double) * f_rates * M_FIELDS);
        if (v_on)
            std::memcpy(v_st, snap_v, sizeof(double) * M_FIELDS);
    };
    const auto step_all = [&](int64_t t) -> int {
        if (b_on && step_b(B, t, env, filt, mdepth, power_thr) >= 0)
            return 0;
        if (f_on && step_f(F, t, env, mdepth, power_thr) >= 0)
            return 1;
        if (v_on && step_v(V, t, env, value, mdepth, power_thr) >= 0)
            return 2;
        return -1;
    };

    save();
    for (int64_t t = t0; t < t1; t++) {
        if (t - snap_t >= SNAP_EVERY) {
            save();
            snap_t = t;
        }
        if (step_all(t) >= 0) {
            restore();
            for (int64_t u = snap_t; u < t; u++)
                step_all(u);
            return t;
        }
    }
    return -1;
}

} // extern "C"
