// Native NFC-V decode-phase loops.
//
// Exact port of nfclab/demod/nfcv.py decode_poll_frame /
// decode_poll_symbol_ppm / decode_listen_start_ask / decode_listen_symbol_ask
// and the frame bit-assembly loops (themselves golden-exact transcriptions of
// tech/NfcV.cpp:450-1074).  The protocol layer (frame build / process()) stays
// in Python; modulation + symbol + stream state is marshaled once per
// frame-level call (layouts in fsm_common.h / runtime/native_walk.py).
//
#include <cmath>
#include <cstdint>

#include "fsm_common.h"

namespace {

// pattern codes (demod/nfcv.py:34-41)
enum {
    V_INVALID = 0,
    V_NOPATTERN = 1,
    V_PATTERN0 = 2,
    V_PATTERN1 = 3,
    V_PATTERN2 = 4,
    V_PATTERN8 = 5,
    V_PATTERNS = 6,
    V_PATTERNE = 7,
};

struct VDecode {
    const float *box;      // box_value(p2); poll SD computed on the fly
    const float *bq;       // box_sq(p1); listen s0 computed on the fly
    int64_t s_oa, s_ob, s_lo;  // s0q[t] = bq[t-s_oa] - bq[t-s_ob], 0 < s_lo
    const float *mdepth;
    const float *deviation;
    int64_t n;
    const int32_t *par;    // P_FIELDS
    double *m;             // modulation state (M_FIELDS)
    double *sym;           // symbol state (S_FIELDS), persisted by caller
    // poll pulse table
    int32_t pulse_bits;
    int32_t pulse_length;
    int32_t periods;
    const int32_t *slot_end;
    // listen guards + SOF windows
    int64_t guard_end;
    int64_t waiting_end;
    const int32_t *sof;    // [s1_min, s1_max, s2_min, s2_max]
    float max_deep;
};

// decode_poll_symbol_ppm (nfcv.py:396-472; NfcV.cpp:672-795)
int poll_symbol_ppm(VDecode &D, int64_t &t)
{
    const int32_t *p = D.par;
    double *m = D.m;
    const int64_t d = p[P_D];

    while (t + 1 < D.n) {
        t += 1;
        if ((double)t < m[M_SEARCH_START]) {
            t = (int64_t)m[M_SEARCH_START] - 1;
            continue;
        }
        const float s0 = fsm_sd_v(D.box, t, d, p[P_P1], p[P_P2]);

        if (s0 > (float)m[M_VALUE_THR]) {
            if (s0 > (float)m[M_CORR_PEAK_V]) {
                m[M_CORR_PEAK_V] = s0;
                m[M_CORR_PEAK_T] = (double)t;
                m[M_SEARCH_END] = (double)(t + p[P_P4]);
            }
        }

        if ((double)t != m[M_SEARCH_END])
            continue;

        const double peak = m[M_CORR_PEAK_T];

        // EOF: pulse in first part of the second slot (NfcV.cpp:734-751)
        if (peak > m[M_SEARCH_START] + p[P_P1] + p[P_P4] &&
            peak < m[M_SEARCH_START] + 2.0 * p[P_P1] - p[P_P4]) {
            m[M_SYM_END] = peak + p[P_P2];
            D.sym[S_VALUE] = 0;
            D.sym[S_START] = m[M_SYM_START] - d;
            D.sym[S_END] = m[M_SYM_END] - d;
            D.sym[S_PATTERN] = V_PATTERNS;
            return V_PATTERNS;
        }

        // default: pulse error
        D.sym[S_VALUE] = 0;
        D.sym[S_START] = m[M_SYM_START] - d;
        D.sym[S_END] = m[M_SYM_END] - d;
        D.sym[S_PATTERN] = V_PATTERNE;

        for (int i = 0; i < D.periods; i++) {
            const double send = (double)D.slot_end[i];
            if (peak > m[M_SEARCH_START] + send - p[P_P4] &&
                peak < m[M_SEARCH_START] + send + p[P_P4]) {
                m[M_SYM_START] = peak - send;
                m[M_SYM_END] = m[M_SYM_START] + D.pulse_length;
                m[M_SEARCH_SYNC] = m[M_SYM_END];
                m[M_SEARCH_START] = m[M_SEARCH_SYNC];
                m[M_SEARCH_END] = m[M_SEARCH_SYNC] + D.pulse_length;
                m[M_CORR_PEAK_T] = 0.0;
                m[M_CORR_PEAK_V] = 0.0;

                D.sym[S_VALUE] = (double)i;
                D.sym[S_START] = m[M_SYM_START] - d;
                D.sym[S_END] = m[M_SYM_END] - d;
                D.sym[S_PATTERN] =
                    D.pulse_bits == 2 ? V_PATTERN2 : V_PATTERN8;
                return (int)D.sym[S_PATTERN];
            }
        }
        return V_PATTERNE;
    }
    return V_INVALID;
}

// decode_listen_start_ask (nfcv.py:555-673; NfcV.cpp:800-980)
int listen_start_ask(VDecode &D, int64_t &t)
{
    const int32_t *p = D.par;
    double *m = D.m;
    const int64_t d = p[P_D];

    while (t + 1 < D.n) {
        t += 1;
        if (t < D.guard_end) {
            t = D.guard_end - 1;
            continue;
        }
        if (t == D.guard_end)
            m[M_VALUE_THR] = D.deviation[t - d];
        if (t > D.waiting_end)
            return V_NOPATTERN;
        if (D.mdepth[t] > D.max_deep)
            return V_NOPATTERN;
        if ((double)t < m[M_SEARCH_START]) {
            int64_t target = (int64_t)m[M_SEARCH_START] - 1;
            if (target > D.waiting_end)
                target = D.waiting_end;
            t = target;
            continue;
        }

        const float s0 = fsm_derived_sub(D.bq, t, D.s_oa, D.s_ob, D.s_lo);
        const float thr = (float)m[M_VALUE_THR];

        if (s0 < -thr && s0 < (float)m[M_CORR_PEAK_V]) {
            m[M_CORR_PEAK_V] = s0;
            m[M_CORR_PEAK_T] = (double)t;
            m[M_SEARCH_END] = (double)(t + p[P_P8]);
        }
        if (s0 > thr && s0 > (float)m[M_CORR_PEAK_V]) {
            m[M_CORR_PEAK_V] = s0;
            m[M_CORR_PEAK_T] = (double)t;
            m[M_SEARCH_END] = (double)(t + p[P_P8]);
        }

        if ((double)t != m[M_SEARCH_END])
            continue;

        if ((int)m[M_MODE] == 0) {  // LISTEN_MODE_PREAMBLE1
            if (m[M_SYM_START] == 0.0) {
                // first burst edge (NfcV.cpp:898-907)
                m[M_SYM_START] = m[M_CORR_PEAK_T] - p[P_P1];
                m[M_SEARCH_START] = m[M_CORR_PEAK_T] + p[P_P0];
                m[M_SEARCH_END] = m[M_SEARCH_START] + p[P_P1];
                m[M_CORR_PEAK_V] = 0.0;
                m[M_CORR_PEAK_T] = 0.0;
                continue;
            }
            m[M_SYM_END] = m[M_CORR_PEAK_T];
            const double s1_len = m[M_SYM_END] - m[M_SYM_START] - p[P_P1];
            if (m[M_CORR_PEAK_T] == 0.0 ||
                s1_len < (double)D.sof[0] || s1_len > (double)D.sof[1]) {
                m[M_MODE] = 0;
                m[M_SEARCH_START] = 0.0;
                m[M_SEARCH_END] = 0.0;
                m[M_SYM_START] = 0.0;
                m[M_SYM_END] = 0.0;
                continue;
            }
            m[M_MODE] = 1;  // LISTEN_MODE_PREAMBLE2
            m[M_SEARCH_START] = m[M_CORR_PEAK_T] + p[P_P1] - p[P_P2];
            m[M_SEARCH_END] = m[M_SEARCH_START] + p[P_P1];
            m[M_CORR_PEAK_V] = 0.0;
            m[M_CORR_PEAK_T] = 0.0;
            continue;
        }

        // LISTEN_MODE_PREAMBLE2 (NfcV.cpp:937-975)
        const double s2_len = m[M_CORR_PEAK_T] - m[M_SYM_END];
        if (m[M_CORR_PEAK_T] == 0.0 ||
            s2_len < (double)D.sof[2] || s2_len > (double)D.sof[3]) {
            m[M_MODE] = 0;
            m[M_SEARCH_START] = 0.0;
            m[M_SEARCH_END] = 0.0;
            m[M_SYM_START] = 0.0;
            m[M_SYM_END] = 0.0;
            continue;
        }

        m[M_SYM_END] = m[M_CORR_PEAK_T];
        m[M_SEARCH_SYNC] = m[M_SYM_END] + p[P_P0];
        m[M_SEARCH_START] = m[M_SEARCH_SYNC] - p[P_P4];
        m[M_SEARCH_END] = m[M_SEARCH_SYNC] + p[P_P4];
        m[M_VALUE_THR] = (double)(float)(m[M_CORR_PEAK_V] * 0.25);
        m[M_CORR0] = 0.0;
        m[M_CORR1] = 0.0;
        m[M_CORR_PEAK_T] = 0.0;
        m[M_CORR_PEAK_V] = 0.0;

        D.sym[S_VALUE] = 0;
        D.sym[S_START] = m[M_SYM_START] - d;
        D.sym[S_END] = m[M_SYM_END] - d;
        D.sym[S_PATTERN] = V_PATTERNS;
        return V_PATTERNS;
    }
    return V_INVALID;
}

// decode_listen_symbol_ask (nfcv.py:688-735; NfcV.cpp:985-1074)
int listen_symbol_ask(VDecode &D, int64_t &t)
{
    const int32_t *p = D.par;
    double *m = D.m;
    const int64_t d = p[P_D];

    while (t + 1 < D.n) {
        t += 1;
        if ((double)t < m[M_SEARCH_START]) {
            t = (int64_t)m[M_SEARCH_START] - 1;
            continue;
        }
        const float s0 = fsm_derived_sub(D.bq, t, D.s_oa, D.s_ob, D.s_lo);
        const float sd_val = std::fabs(s0);

        if (sd_val > (float)m[M_VALUE_THR] &&
            sd_val > (float)m[M_CORR_PEAK_V]) {
            m[M_CORR0] = s0;
            m[M_CORR1] = -s0;
            m[M_CORR_PEAK_V] = sd_val;
            m[M_SYM_END] = (double)t;
        }

        if ((double)t != m[M_SEARCH_END])
            continue;

        if ((float)m[M_CORR_PEAK_V] < (float)m[M_VALUE_THR])
            return V_PATTERNS;  // EoF; symbol state left untouched

        m[M_SYM_START] = m[M_SYM_END];
        m[M_SYM_END] = m[M_SYM_START] + p[P_P0];
        m[M_SEARCH_SYNC] = m[M_SYM_END];
        m[M_SEARCH_START] = m[M_SEARCH_SYNC] - p[P_P4];
        m[M_SEARCH_END] = m[M_SEARCH_SYNC] + p[P_P4];
        m[M_VALUE_THR] = (double)(float)(m[M_CORR_PEAK_V] * 0.25);
        m[M_CORR_PEAK_T] = 0.0;
        m[M_CORR_PEAK_V] = 0.0;

        const int value = ((float)m[M_CORR0] > (float)m[M_CORR1]) ? 0 : 1;
        D.sym[S_VALUE] = (double)value;
        D.sym[S_START] = m[M_SYM_START] - d;
        D.sym[S_END] = m[M_SYM_END] - d;
        D.sym[S_PATTERN] = value ? V_PATTERN1 : V_PATTERN0;
        return (int)D.sym[S_PATTERN];
    }
    return V_INVALID;
}

// Shared frame bit-assembly step.  Returns an R_* code or -1 to continue.
int frame_step(VDecode &D, int pattern, int bits_per_symbol,
               int64_t max_frame_size, int64_t *stream, uint8_t *buf,
               int64_t *aux)
{
    const bool frame_end = pattern == V_PATTERNS;
    const bool stream_error = !frame_end && pattern == V_PATTERNE;
    const bool truncate_error = !frame_end && !stream_error &&
                                stream[ST_BYTES] == max_frame_size;

    if (frame_end || stream_error || truncate_error) {
        if (stream[ST_BYTES] > 0) {
            if (stream[ST_BITS] == 8)
                buf[stream[ST_BYTES]++] = (uint8_t)stream[ST_DATA];
            aux[0] = (truncate_error || stream_error) ? 1 : 0;
            aux[1] = (int64_t)D.sym[S_END];
            return R_FRAME;
        }
        return R_RESET;
    }

    if (stream[ST_BITS] == 8) {
        buf[stream[ST_BYTES]++] = (uint8_t)stream[ST_DATA];
        stream[ST_DATA] = 0;
        stream[ST_BITS] = 0;
    }
    stream[ST_DATA] |= (int64_t)D.sym[S_VALUE] << stream[ST_BITS];
    stream[ST_BITS] += bits_per_symbol;
    return -1;
}

} // namespace

extern "C" {

// Poll frame loop (nfcv.py:325-394; NfcV.cpp:450-556).
// aux out: [0] = truncated flag, [1] = frame_end (on R_FRAME).
int32_t nfclab_v_poll_frame(
    const float *box_arr, int64_t n,
    const int32_t *par, double *mod, double *sym,
    int32_t pulse_bits, int32_t pulse_length, int32_t periods,
    const int32_t *slot_end, int64_t max_frame_size,
    int64_t *t_io, int64_t *stream, uint8_t *buf, int64_t *aux)
{
    VDecode D {box_arr, nullptr, 0, 0, 0, nullptr, nullptr, n, par, mod, sym,
               pulse_bits, pulse_length, periods, slot_end,
               0, 0, nullptr, 0.0f};
    int64_t t = *t_io;

    for (;;) {
        const int pattern = poll_symbol_ppm(D, t);
        if (pattern <= V_NOPATTERN) {
            *t_io = t;
            return R_END_OF_SIGNAL;
        }
        const int r = frame_step(D, pattern, pulse_bits, max_frame_size,
                                 stream, buf, aux);
        if (r >= 0) {
            *t_io = t;
            return r;
        }
    }
}

// Listen frame loop (nfcv.py:489-553; NfcV.cpp:561-667).
// have_start: frame.frame_start already set (resume mid-frame).
// aux out: [0] = truncated, [1] = frame_end, [2] = frame_start,
//          [3] = 1 if SOF was found this call.
int32_t nfclab_v_listen_frame(
    const float *bq, int64_t s_oa, int64_t s_ob, int64_t s_lo,
    const float *mdepth, const float *deviation, int64_t n,
    const int32_t *par, double *mod, double *sym,
    const int32_t *sof_bounds,
    int64_t guard_end, int64_t waiting_end,
    float max_deep, int64_t max_frame_size, int32_t have_start,
    int64_t *t_io, int64_t *stream, uint8_t *buf, int64_t *aux)
{
    VDecode D {nullptr, bq, s_oa, s_ob, s_lo, mdepth, deviation,
               n, par, mod, sym,
               0, 0, 0, nullptr,
               guard_end, waiting_end, sof_bounds, max_deep};
    int64_t t = *t_io;

    if (!have_start) {
        const int pattern = listen_start_ask(D, t);
        if (pattern == V_PATTERNS) {
            aux[2] = (int64_t)D.sym[S_START];
            aux[3] = 1;
        } else {
            *t_io = t;
            return pattern == V_NOPATTERN ? R_NO_PATTERN : R_END_OF_SIGNAL;
        }
    }

    for (;;) {
        const int pattern = listen_symbol_ask(D, t);
        if (pattern <= V_NOPATTERN) {
            *t_io = t;
            return R_END_OF_SIGNAL;
        }
        const int r = frame_step(D, pattern, 1, max_frame_size,
                                 stream, buf, aux);
        if (r >= 0) {
            *t_io = t;
            return r;
        }
    }
}

} // extern "C"
