// Native NFC-F decode-phase loops.
//
// Exact port of nfclab/demod/nfcf.py decode_symbol_ask /
// decode_listen_start_ask and the poll/listen frame bit-assembly loops
// (themselves golden-exact transcriptions of tech/NfcF.cpp:428-1042).
// Frame build (_finish_frame: sync check, short-stream reject) and the
// protocol layer stay in Python.

#include <cmath>
#include <cstdint>

#include "fsm_common.h"

namespace {

// pattern codes (demod/nfcf.py:31-36)
enum {
    F_INVALID = 0,
    F_NOPATTERN = 1,
    F_PATTERNL = 2,
    F_PATTERNH = 3,
    F_PATTERNS = 4,
    F_PATTERNE = 5,
};

// search_mode_state (demod/nfcf.py:38-39)
enum { F_OBSERVED = 0, F_REVERSED = 1 };

struct FDecode {
    const float *box;      // box_value(p2); |SD| computed on the fly (d = 0)
    const float *deviation;
    int64_t n;
    const int32_t *par;    // P_FIELDS (with P_PRE1)
    double *m;
    double *sym;
    int64_t guard_end;
    int64_t waiting_end;
};

// _corr: S0/S1 at clock t with d = 0 (nfcf.py:153-157)
inline void f_corr(const FDecode &D, int64_t t, float &s0, float &s1)
{
    const int32_t gap = D.par[P_P1] - D.par[P_P2];
    s0 = D.box[t] - D.box[t - gap];
    s1 = D.box[t - gap] - D.box[t - 1];
}

// per-rate preamble search reset (nfcf.py:280-292; NfcF.cpp:316-326)
inline void f_reset_search(double *m)
{
    m[M_SYM_START] = 0.0;
    m[M_SYM_END] = 0.0;
    m[M_SEARCH_SYNC] = 0.0;
    m[M_SYNC_VALUE] = 0.0;
    m[M_SEARCH_START] = 0.0;
    m[M_SEARCH_END] = 0.0;
    m[M_PULSE_WIDTH] = 0.0;
    m[M_VALUE_THR] = 0.0;
    m[M_CORR_PEAK_V] = 0.0;
    m[M_CORR_PEAK_T] = 0.0;
}

// decode_symbol_ask (nfcf.py:442-501; NfcF.cpp:641-744 / 941-1042)
int f_symbol_ask(FDecode &D, int64_t &t)
{
    const int32_t *p = D.par;
    double *m = D.m;

    while (t + 1 < D.n) {
        t += 1;
        if ((double)t < m[M_SEARCH_START]) {
            t = (int64_t)m[M_SEARCH_START] - 1;
            continue;
        }

        const float sd =
            std::fabs(fsm_sd_af(D.box, t, 0, p[P_P1], p[P_P2]));

        if (sd > (float)m[M_VALUE_THR] && sd > (float)m[M_CORR_PEAK_V]) {
            m[M_CORR_PEAK_V] = sd;
            m[M_CORR_PEAK_T] = (double)t;
        }

        if ((double)t == m[M_SEARCH_SYNC]) {
            float s0, s1;
            f_corr(D, t, s0, s1);
            m[M_CORR0] = s0;
            m[M_CORR1] = s1;
        }

        if ((double)t != m[M_SEARCH_END])
            continue;

        if (m[M_CORR_PEAK_T] == 0.0)
            return F_PATTERNE;

        m[M_SYM_START] = m[M_SYM_END];
        m[M_SYM_END] = m[M_CORR_PEAK_T];
        m[M_SEARCH_SYNC] = m[M_SYM_END] + p[P_P1];
        m[M_SEARCH_START] = m[M_SEARCH_SYNC] - p[P_P4];
        m[M_SEARCH_END] = m[M_SEARCH_SYNC] + p[P_P4];
        m[M_VALUE_THR] = (double)(float)(m[M_CORR_PEAK_V] / 2.0);
        m[M_CORR_PEAK_T] = 0.0;
        m[M_CORR_PEAK_V] = 0.0;

        D.sym[S_START] = m[M_SYM_START];
        D.sym[S_END] = m[M_SYM_END];

        const int mode = (int)m[M_MODE];
        const float c0 = (float)m[M_CORR0];
        const float c1 = (float)m[M_CORR1];
        if ((mode == F_OBSERVED && c0 > c1) ||
            (mode == F_REVERSED && c0 < c1)) {
            D.sym[S_VALUE] = 0;
            D.sym[S_PATTERN] = F_PATTERNL;
        } else {
            D.sym[S_VALUE] = 1;
            D.sym[S_PATTERN] = F_PATTERNH;
        }
        return (int)D.sym[S_PATTERN];
    }
    return F_INVALID;
}

// decode_listen_start_ask (nfcf.py:503-608; NfcF.cpp:749-936)
int f_listen_start(FDecode &D, int64_t &t)
{
    const int32_t *p = D.par;
    double *m = D.m;

    while (t + 1 < D.n) {
        t += 1;
        if (t < D.guard_end) {
            t = D.guard_end - 1;
            continue;
        }
        if (t == D.guard_end)
            m[M_VALUE_THR] = (double)(D.deviation[t] * 10.0f);
        if (t > D.waiting_end)
            return F_NOPATTERN;
        if ((double)t < m[M_SEARCH_START])
            continue;

        const float sd =
            std::fabs(fsm_sd_af(D.box, t, 0, p[P_P1], p[P_P2]));

        if (sd >= (float)m[M_VALUE_THR]) {
            if (sd > (float)m[M_CORR_PEAK_V]) {
                m[M_CORR_PEAK_V] = sd;
                m[M_CORR_PEAK_T] = (double)t;
                if (m[M_SEARCH_SYNC] == 0.0) {
                    float s0, s1;
                    f_corr(D, t, s0, s1);
                    m[M_SYNC_VALUE] = sd;
                    m[M_CORR0] = s0;
                    m[M_SEARCH_END] = (double)(t + p[P_P8]);
                }
            }
        }

        if ((double)t == m[M_SEARCH_SYNC]) {
            float s0, s1;
            f_corr(D, t, s0, s1);
            m[M_SYNC_VALUE] = sd;
            m[M_LAST_VALUE] = s0;
        }

        if ((double)t != m[M_SEARCH_END])
            continue;

        // preamble pulse validity for the first 94 pulses (NfcF.cpp:307-328)
        const double pw = m[M_PULSE_WIDTH];
        m[M_PULSE_WIDTH] = pw + 1.0;
        if (pw < 94.0) {
            if (m[M_CORR_PEAK_T] == 0.0 ||
                (float)m[M_SYNC_VALUE] < (float)m[M_VALUE_THR]) {
                f_reset_search(m);
                continue;
            }
        }

        if ((float)m[M_SYNC_VALUE] > (float)m[M_VALUE_THR]) {
            if (m[M_SYM_START] == 0.0)
                m[M_SYM_START] = m[M_CORR_PEAK_T] - p[P_P2];
            m[M_SYM_END] = m[M_CORR_PEAK_T];
            m[M_SEARCH_SYNC] = m[M_SYM_END] + p[P_P2];
            m[M_SEARCH_START] = m[M_SEARCH_SYNC] - p[P_P8];
            m[M_SEARCH_END] = m[M_SEARCH_SYNC] + p[P_P8];
            m[M_VALUE_THR] = (double)(float)(m[M_CORR_PEAK_V] / 2.0);
            m[M_LAST_PHASE] = m[M_LAST_VALUE];
            m[M_CORR_PEAK_T] = 0.0;
            m[M_CORR_PEAK_V] = 0.0;
            continue;
        }

        // polarity compensation (NfcF.cpp:354-355)
        if ((m[M_LAST_PHASE] < 0 && m[M_CORR0] < 0) ||
            (m[M_LAST_PHASE] > 0 && m[M_CORR0] > 0))
            m[M_SYM_START] -= p[P_P2];

        const double preamble_len = m[M_SYM_END] - m[M_SYM_START];
        if (preamble_len < (double)(p[P_PRE1] - p[P_P4]) ||
            preamble_len > (double)(p[P_PRE1] + p[P_P4])) {
            f_reset_search(m);
            continue;
        }

        m[M_MODE] = m[M_LAST_PHASE] > 0 ? F_OBSERVED : F_REVERSED;
        m[M_SEARCH_SYNC] = m[M_SEARCH_SYNC] + p[P_P2];
        m[M_SEARCH_START] = m[M_SEARCH_SYNC] - p[P_P4];
        m[M_SEARCH_END] = m[M_SEARCH_SYNC] + p[P_P4];
        m[M_CORR_PEAK_T] = 0.0;
        m[M_CORR_PEAK_V] = 0.0;

        D.sym[S_START] = m[M_SYM_START];
        D.sym[S_END] = m[M_SYM_END];
        D.sym[S_PATTERN] = F_PATTERNS;
        return F_PATTERNS;
    }
    return F_INVALID;
}

} // namespace

extern "C" {

// Poll/listen frame loop (nfcf.py:350-440; NfcF.cpp:428-636).
// listen: run the listen path (SOF search first unless have_start).
// aux out: [0] = truncated, [2] = frame_start, [3] = 1 if SOF found.
// On R_FRAME the Python side builds the frame via _finish_frame (which
// also handles the short-stream reject + sync-word check).
int32_t nfclab_f_frame(
    const float *box, const float *deviation, int64_t n,
    const int32_t *par, double *mod, double *sym,
    int32_t listen, int32_t have_start,
    int64_t guard_end, int64_t waiting_end, int64_t max_frame_size,
    int64_t *t_io, int64_t *stream, uint8_t *buf, int64_t *aux)
{
    FDecode D {box, deviation, n, par, mod, sym,
               guard_end, waiting_end};
    int64_t t = *t_io;

    if (listen && !have_start) {
        const int pattern = f_listen_start(D, t);
        if (pattern == F_PATTERNS) {
            aux[2] = (int64_t)D.sym[S_START];
            aux[3] = 1;
        } else {
            *t_io = t;
            return pattern == F_NOPATTERN ? R_NO_PATTERN : R_END_OF_SIGNAL;
        }
    }

    for (;;) {
        const int pattern = f_symbol_ask(D, t);
        if (pattern <= F_NOPATTERN) {
            *t_io = t;
            return R_END_OF_SIGNAL;
        }

        const bool frame_end = pattern == F_PATTERNE;
        const bool truncate_error =
            !frame_end && stream[ST_BYTES] == max_frame_size;

        if (frame_end || truncate_error) {
            aux[0] = truncate_error ? 1 : 0;
            *t_io = t;
            return R_FRAME;
        }

        // MSB-first bit assembly (NfcF.cpp:516-524)
        stream[ST_DATA] =
            ((stream[ST_DATA] << 1) | (int64_t)D.sym[S_VALUE]) & 0xFF;
        stream[ST_BITS] += 1;
        if (stream[ST_BITS] == 8) {
            buf[stream[ST_BYTES]++] = (uint8_t)stream[ST_DATA];
            stream[ST_DATA] = 0;
            stream[ST_BITS] = 0;
        }
    }
}

} // extern "C"
