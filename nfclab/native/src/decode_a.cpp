// Native NFC-A decode-phase loops.
//
// Exact port of nfclab/demod/nfca.py decode_poll_frame /
// decode_poll_symbol_ask / decode_listen_{start,symbol}_ask /
// decode_listen_{start,symbol}_bpsk and the frame bit-assembly loops
// (themselves golden-exact transcriptions of tech/NfcA.cpp:432-1424).
// The protocol layer (process() REQA/SELn/RATS/... FSM) stays in Python;
// modulation + symbol + stream state is marshaled once per frame-level call
// (layouts in fsm_common.h / runtime/native_walk.py).
//
#include <cmath>
#include <cstdint>

#include "fsm_common.h"

namespace {

// pattern codes (demod/nfca.py:40-51; NfcA.cpp:35-49)
enum {
    A_INVALID = 0,
    A_NOPATTERN = 1,
    A_PATTERNX = 2,
    A_PATTERNY = 3,
    A_PATTERNZ = 4,
    A_PATTERND = 5,
    A_PATTERNE = 6,
    A_PATTERNF = 7,
    A_PATTERNM = 8,
    A_PATTERNN = 9,
    A_PATTERNS = 10,
    A_PATTERNO = 11,
};

struct ADecode {
    const float *box;      // poll box-value channel (sample-time indexed)
    const float *bq;       // listen ASK squared box channel (sample indexed)
    const float *bp;       // BPSK product box channel (sample indexed)
    int64_t s_oa, s_ob, s_lo;  // s0q[t] = bq[t-s_oa] - bq[t-s_ob], 0 < s_lo
    int64_t p_d;               // pb4[t] = bp[t-p_d], 0 below p_d
    const float *mdepth;
    const float *deviation;
    int64_t n;
    const int32_t *par;    // P_FIELDS
    double *m;             // modulation state (M_FIELDS)
    double *sym;           // symbol state (S_FIELDS), persisted by caller
    int64_t guard_end;
    int64_t waiting_end;
    float min_deep;        // minimumModulationDeep
    int32_t etu;           // elementaryTimeUnit (BPSK preamble bounds)
    double bpsk_c;         // telescoped BPSK integrator constant
};

// decode_poll_symbol_ask (nfca.py:440-509; NfcA.cpp:812-934)
int poll_symbol_ask(ADecode &D, int64_t &t)
{
    const int32_t *p = D.par;
    double *m = D.m;
    const int64_t d = p[P_D];
    const int64_t p1 = p[P_P1], p2 = p[P_P2], p8 = p[P_P8];
    const float fp2 = (float)p2;

    while (t + 1 < D.n) {
        t += 1;
        if ((double)t < m[M_SEARCH_START]) {
            t = (int64_t)m[M_SEARCH_START] - 1;
            continue;
        }

        const int64_t u = t - d;
        const float s0 = D.box[u] - D.box[u - (p1 - p2)];
        const float s1 = D.box[u - (p1 - p2)] - D.box[u - 1];
        const float sd = std::fabs(s0 - s1) / fp2;

        if (sd > (float)m[M_CORR_PEAK_V] && sd > (float)m[M_VALUE_THR]) {
            m[M_CORR_PEAK_V] = sd;
            m[M_CORR_PEAK_T] = (double)t;
        }

        if ((double)t == m[M_SEARCH_SYNC]) {
            m[M_CORR_D] = sd;
            m[M_CORR0] = s0;
            m[M_CORR1] = s1;
        }

        if ((double)t != m[M_SEARCH_END])
            continue;

        // classify symbol (NfcA.cpp:876-913)
        if ((float)m[M_CORR_D] < (float)m[M_VALUE_THR]) {
            m[M_SYM_START] = m[M_SYM_END];
            m[M_SYM_END] = m[M_SEARCH_SYNC];
            m[M_RISE_TIME] = m[M_SYM_START];
            D.sym[S_VALUE] = 1;
            D.sym[S_PATTERN] = A_PATTERNY;
        } else if ((float)m[M_CORR0] > (float)m[M_CORR1]) {
            m[M_SYM_START] = m[M_SYM_END];
            m[M_SYM_END] = m[M_CORR_PEAK_T];
            m[M_RISE_TIME] = m[M_CORR_PEAK_T] - (double)p2;
            D.sym[S_VALUE] = 0;
            D.sym[S_PATTERN] = A_PATTERNZ;
        } else {
            m[M_SYM_START] = m[M_SYM_END];
            m[M_SYM_END] = m[M_CORR_PEAK_T];
            m[M_RISE_TIME] = m[M_CORR_PEAK_T];
            D.sym[S_VALUE] = 1;
            D.sym[S_PATTERN] = A_PATTERNX;
        }

        m[M_SEARCH_SYNC] = m[M_SYM_END] + (double)p1;
        m[M_SEARCH_START] = m[M_SEARCH_SYNC] - (double)p8;
        m[M_SEARCH_END] = m[M_SEARCH_SYNC] + (double)p8;
        m[M_CORR_D] = 0.0;
        m[M_CORR0] = 0.0;
        m[M_CORR1] = 0.0;
        m[M_CORR_PEAK_T] = 0.0;
        m[M_CORR_PEAK_V] = 0.0;

        D.sym[S_START] = m[M_SYM_START] - (double)d;
        D.sym[S_END] = m[M_SYM_END] - (double)d;
        D.sym[S_EDGE] = m[M_RISE_TIME] - (double)d;
        return (int)D.sym[S_PATTERN];
    }
    return A_INVALID;
}

// decode_listen_start_ask (nfca.py:597-700; NfcA.cpp:939-1090).
// The Python idle-skip helper jumps over samples where nothing can change;
// stepping them here is a no-op (search_end_time is never in the future while
// symbol_start_time == 0), so the plain loop is bit-identical.
int listen_start_ask(ADecode &D, int64_t &t)
{
    const int32_t *p = D.par;
    double *m = D.m;
    const int64_t d = p[P_D];
    const int64_t p1 = p[P_P1], p2 = p[P_P2], p4 = p[P_P4], p8 = p[P_P8];

    while (t + 1 < D.n) {
        t += 1;
        if (t < D.guard_end) {
            t = D.guard_end - 1;
            continue;
        }
        if (t == D.guard_end)
            m[M_VALUE_THR] = (double)(float)(D.deviation[t - d] * (float)p8);
        if (t > D.waiting_end)
            return A_NOPATTERN;
        if (D.mdepth[t] > D.min_deep)
            return A_NOPATTERN;

        const float s0 = fsm_derived_sub(D.bq, t, D.s_oa, D.s_ob, D.s_lo);
        if (m[M_SYM_START] == 0.0) {
            if (s0 > (float)m[M_VALUE_THR] && s0 > (float)m[M_CORR_PEAK_V]) {
                m[M_CORR_PEAK_V] = s0;
                m[M_CORR_PEAK_T] = (double)t;
                m[M_SEARCH_END] = (double)(t + p4);
            }
        } else {
            if (s0 < -(float)m[M_VALUE_THR] && s0 < (float)m[M_CORR_PEAK_V]) {
                m[M_CORR_PEAK_V] = s0;
                m[M_CORR_PEAK_T] = (double)t;
            }
        }

        if ((double)t != m[M_SEARCH_END])
            continue;

        if (m[M_SYM_START] == 0.0) {
            // first edge found (NfcA.cpp:1032-1040)
            m[M_SEARCH_SYNC] = m[M_CORR_PEAK_T] + (double)p2;
            m[M_SEARCH_END] = m[M_SEARCH_END] + (double)p2;
            m[M_SYM_START] = m[M_CORR_PEAK_T] - (double)p2;
            m[M_CORR_PEAK_T] = 0.0;
            m[M_CORR_PEAK_V] = 0.0;
            continue;
        }

        // pulse measured (NfcA.cpp:1042-1067)
        m[M_SYM_END] = m[M_CORR_PEAK_T];
        m[M_PULSE_WIDTH] = m[M_SYM_END] - m[M_SYM_START];
        const double min_width = (double)(p1 - p8);
        const double max_width = (double)(p1 + p8);
        if (m[M_CORR_PEAK_T] == 0.0 || m[M_PULSE_WIDTH] < min_width ||
            m[M_PULSE_WIDTH] > max_width) {
            m[M_SYM_START] = 0.0;
            m[M_SYM_END] = 0.0;
            m[M_SEARCH_SYNC] = 0.0;
            m[M_SEARCH_START] = 0.0;
            m[M_SEARCH_END] = 0.0;
            m[M_PULSE_WIDTH] = 0.0;
            m[M_CORR_PEAK_T] = 0.0;
            m[M_CORR_PEAK_V] = 0.0;
            m[M_DET_PEAK_T] = 0.0;
            m[M_DET_PEAK_V] = 0.0;
            continue;
        }

        // SoF locked (NfcA.cpp:1069-1086)
        m[M_SEARCH_SYNC] = m[M_SYM_END] + (double)p1;
        m[M_SEARCH_START] = m[M_SEARCH_SYNC] - (double)p8;
        m[M_SEARCH_END] = m[M_SEARCH_SYNC] + (double)p8;
        m[M_VALUE_THR] =
            (double)std::fabs((float)((float)m[M_CORR_PEAK_V] * 0.25f));
        m[M_CORR0] = 0.0;
        m[M_CORR1] = 0.0;
        m[M_CORR_PEAK_T] = 0.0;
        m[M_CORR_PEAK_V] = 0.0;

        D.sym[S_VALUE] = 1;
        D.sym[S_START] = m[M_SYM_START] - (double)d;
        D.sym[S_END] = m[M_SYM_END] - (double)d;
        D.sym[S_PATTERN] = A_PATTERND;
        return A_PATTERND;
    }
    return A_INVALID;
}

// decode_listen_symbol_ask (nfca.py:718-781; NfcA.cpp:1095-1213)
int listen_symbol_ask(ADecode &D, int64_t &t)
{
    const int32_t *p = D.par;
    double *m = D.m;
    const int64_t d = p[P_D];
    const int64_t p1 = p[P_P1], p2 = p[P_P2], p8 = p[P_P8];

    while (t + 1 < D.n) {
        t += 1;
        if ((double)t < m[M_SEARCH_START]) {
            t = (int64_t)m[M_SEARCH_START] - 1;
            continue;
        }

        const int64_t u = t - d;
        const float s0 = D.bq[u] - D.bq[u - (p1 - p2)];
        const float s1 = D.bq[u - (p1 - p2)] - D.bq[u - 1];
        const float sd = std::fabs(s0 - s1);

        if (sd > (float)m[M_CORR_PEAK_V]) {
            m[M_CORR_PEAK_V] = sd;
            m[M_CORR_PEAK_T] = (double)t;
        }

        if ((double)t == m[M_SEARCH_SYNC]) {
            m[M_CORR_D] = sd;
            m[M_CORR0] = s0;
            m[M_CORR1] = s1;
        }

        if ((double)t != m[M_SEARCH_END])
            continue;

        if ((float)m[M_CORR_D] > (float)m[M_VALUE_THR]) {
            m[M_SYM_START] = m[M_SYM_END];
            m[M_SYM_END] = m[M_CORR_PEAK_T];
            m[M_VALUE_THR] = (double)(float)((float)m[M_CORR_PEAK_V] * 0.25f);
            if ((float)m[M_CORR0] > (float)m[M_CORR1]) {
                m[M_RISE_TIME] = m[M_SEARCH_SYNC];
                D.sym[S_VALUE] = 0;
                D.sym[S_PATTERN] = A_PATTERNE;
            } else {
                m[M_RISE_TIME] = m[M_SEARCH_SYNC] - (double)p2;
                D.sym[S_VALUE] = 1;
                D.sym[S_PATTERN] = A_PATTERND;
            }
        } else {
            m[M_SYM_START] = m[M_SYM_END];
            m[M_SYM_END] = m[M_SEARCH_SYNC];
            m[M_RISE_TIME] = 0.0;
            D.sym[S_PATTERN] = A_PATTERNF;
        }

        m[M_SEARCH_SYNC] = m[M_SYM_END] + (double)p1;
        m[M_SEARCH_START] = m[M_SEARCH_SYNC] - (double)p8;
        m[M_SEARCH_END] = m[M_SEARCH_SYNC] + (double)p8;
        m[M_CORR_PEAK_T] = 0.0;
        m[M_CORR_PEAK_V] = 0.0;

        D.sym[S_START] = m[M_SYM_START] - (double)d;
        D.sym[S_END] = m[M_SYM_END] - (double)d;
        D.sym[S_EDGE] = m[M_RISE_TIME] - (double)d;
        return (int)D.sym[S_PATTERN];
    }
    return A_INVALID;
}

// decode_listen_start_bpsk (nfca.py:840-916; NfcA.cpp:1220-1329).
// Same naive-loop equivalence argument as listen_start_ask for the idle skip.
int listen_start_bpsk(ADecode &D, int64_t &t)
{
    const int32_t *p = D.par;
    double *m = D.m;
    const int64_t d = p[P_D];
    const int64_t p1 = p[P_P1], p2 = p[P_P2];

    while (t + 1 < D.n) {
        t += 1;
        if (t < D.guard_end) {
            t = D.guard_end - 1;
            continue;
        }
        if (t == D.guard_end) {
            m[M_VALUE_THR] = (double)D.deviation[t - d];
            // phase integration telescopes to PB4(t) - PB4(guardEnd-1)
            D.bpsk_c = (double)fsm_derived_at(D.bp, t - 1, D.p_d);
        }
        if (t > D.waiting_end)
            return A_NOPATTERN;
        if (D.mdepth[t] > D.min_deep)
            return A_NOPATTERN;

        const float phase = fsm_derived_at(D.bp, t, D.p_d) - (float)D.bpsk_c;

        if (phase > (float)m[M_VALUE_THR]) {
            if (m[M_SYM_START] == 0.0)
                m[M_SYM_START] = (double)t;
            m[M_SEARCH_END] = (double)(t + p2);
        }
        // (idle skip elided; see note above)

        if (m[M_SYM_END] == 0.0 &&
            (phase < 0.0f || (double)t == m[M_SEARCH_END])) {
            const int64_t preamble_len = t - (int64_t)m[M_SYM_START];
            if (preamble_len < (int64_t)D.etu * 3 ||
                preamble_len > (int64_t)D.etu * 4) {
                m[M_SYM_START] = 0.0;
                m[M_SYM_END] = 0.0;
                m[M_SEARCH_END] = 0.0;
                continue;
            }
            m[M_SYM_END] = m[M_SEARCH_END] + (double)p2;
        }

        if ((double)t != m[M_SEARCH_END])
            continue;

        // SoF locked (NfcA.cpp:1310-1325)
        m[M_SEARCH_SYNC] = m[M_SYM_END] + (double)p2;
        m[M_LAST_PHASE] = (double)phase;
        m[M_PHASE_THR] = (double)std::fabs((float)(phase * 0.25f));
        m[M_DET_PEAK_T] = 0.0;

        D.sym[S_VALUE] = 0;
        D.sym[S_START] = m[M_SYM_START] - (double)p1 - (double)d;
        D.sym[S_END] = m[M_SYM_END] - (double)p1 - (double)d;
        D.sym[S_PATTERN] = A_PATTERNS;
        return A_PATTERNS;
    }
    return A_INVALID;
}

// decode_listen_symbol_bpsk (nfca.py:933-981; NfcA.cpp:1334-1421)
int listen_symbol_bpsk(ADecode &D, int64_t &t)
{
    const int32_t *p = D.par;
    double *m = D.m;
    const int64_t d = p[P_D];
    const int64_t p1 = p[P_P1], p2 = p[P_P2];

    while (t + 1 < D.n) {
        t += 1;
        const float phase = fsm_derived_at(D.bp, t, D.p_d) - (float)D.bpsk_c;

        if (m[M_DET_PEAK_T] == 0.0) {
            if ((phase > 0.0f && (float)m[M_LAST_PHASE] < 0.0f) ||
                (phase < 0.0f && (float)m[M_LAST_PHASE] > 0.0f)) {
                m[M_DET_PEAK_T] = (double)t;
                m[M_SEARCH_SYNC] = (double)(t + p2);
                m[M_LAST_PHASE] = (double)phase;
            }
        }

        if ((double)t != m[M_SEARCH_SYNC])
            continue;

        if (std::fabs(phase) < std::fabs((float)m[M_PHASE_THR]))
            return A_PATTERNO;

        m[M_SYM_START] = m[M_SYM_END];
        m[M_SYM_END] = m[M_SEARCH_SYNC] + (double)p2;
        m[M_SEARCH_SYNC] = m[M_SEARCH_SYNC] + (double)p1;
        m[M_LAST_PHASE] = (double)phase;
        m[M_DET_PEAK_T] = 0.0;

        if (phase < -(float)m[M_PHASE_THR]) {
            D.sym[S_VALUE] = 1.0 - D.sym[S_VALUE];
            D.sym[S_PATTERN] = ((int)D.sym[S_PATTERN] == A_PATTERNM)
                                   ? A_PATTERNN
                                   : A_PATTERNM;
        } else {
            m[M_PHASE_THR] = (double)(float)(phase * 0.25f);
        }

        D.sym[S_START] = m[M_SYM_START] - (double)p1 - (double)d;
        D.sym[S_END] = m[M_SYM_END] - (double)p1 - (double)d;
        return (int)D.sym[S_PATTERN];
    }
    return A_INVALID;
}

} // namespace

extern "C" {

// Poll frame loop (nfca.py:350-438; NfcA.cpp:432-563).
// aux: [0] = truncated (out), [1] = frame_end (in/out).
// Returns R_FRAME (final partial byte already appended; caller emits with
// ShortFrame when bytes==1 && bits==7), R_RESET, or R_END_OF_SIGNAL.
int32_t nfclab_a_poll_frame(
    const float *box, int64_t n,
    const int32_t *par, double *mod, double *sym,
    int64_t max_frame_size,
    int64_t *t_io, int64_t *stream, uint8_t *buf, int64_t *aux)
{
    ADecode D {box, nullptr, nullptr, 0, 0, 0, 0, nullptr, nullptr,
               n, par, mod, sym, 0, 0, 0.0f, 0, 0.0};
    int64_t t = *t_io;

    for (;;) {
        const int pattern = poll_symbol_ask(D, t);
        if (pattern <= A_NOPATTERN) {
            *t_io = t;
            return R_END_OF_SIGNAL;
        }

        stream[ST_PATTERN] = pattern;
        bool frame_end = false;
        bool truncate_error = false;

        if (stream[ST_PATTERN] == A_PATTERNY &&
            (stream[ST_PREVIOUS] == A_PATTERNY ||
             stream[ST_PREVIOUS] == A_PATTERNZ))
            frame_end = true;
        else if (stream[ST_BYTES] == max_frame_size)
            truncate_error = true;

        if (frame_end || truncate_error) {
            *t_io = t;
            if (stream[ST_BYTES] > 0 || stream[ST_BITS] == 7) {
                if (stream[ST_BITS] >= 7)
                    buf[stream[ST_BYTES]++] = (uint8_t)stream[ST_DATA];
                aux[0] = truncate_error ? 1 : 0;
                return R_FRAME;
            }
            return R_RESET;
        }

        if (D.sym[S_EDGE] != 0.0)
            aux[1] = (int64_t)D.sym[S_EDGE];

        if (stream[ST_PREVIOUS]) {
            const int64_t value =
                stream[ST_PREVIOUS] == A_PATTERNX ? 1 : 0;
            if (stream[ST_BITS] < 8) {
                stream[ST_DATA] |= value << stream[ST_BITS];
                stream[ST_BITS] += 1;
            } else if (stream[ST_BYTES] < max_frame_size) {
                buf[stream[ST_BYTES]++] = (uint8_t)stream[ST_DATA];
                if (!fsm_check_parity((uint64_t)stream[ST_DATA],
                                      (uint64_t)value))
                    stream[ST_FLAGS] |= FLAG_PARITY_ERROR;
                stream[ST_DATA] = 0;
                stream[ST_BITS] = 0;
            } else {
                *t_io = t;
                return R_RESET;
            }
        }

        stream[ST_PREVIOUS] = stream[ST_PATTERN];
    }
}

// ASK listen frame loop (nfca.py:539-595; NfcA.cpp:574-688).
// aux: [0] = truncated, [1] = frame_end (in/out), [2] = frame_start,
//      [3] = 1 if SoF was found this call.
// Returns R_FRAME (caller emits with ShortFrame when bytes==1 && bits==4,
// then resets modulation), R_FRAME_SEARCH (spurious SoF; caller applies
// reset_frame_search), R_NO_PATTERN, R_RESET, or R_END_OF_SIGNAL.
int32_t nfclab_a_listen_ask_frame(
    const float *bq, int64_t s_oa, int64_t s_ob, int64_t s_lo,
    const float *mdepth,
    const float *deviation, int64_t n,
    const int32_t *par, double *mod, double *sym,
    int64_t guard_end, int64_t waiting_end,
    float min_deep, int64_t max_frame_size, int32_t have_start,
    int64_t *t_io, int64_t *stream, uint8_t *buf, int64_t *aux)
{
    ADecode D {nullptr, bq, nullptr, s_oa, s_ob, s_lo, 0, mdepth, deviation,
               n, par, mod, sym, guard_end, waiting_end, min_deep, 0, 0.0};
    int64_t t = *t_io;

    if (!have_start) {
        const int pattern = listen_start_ask(D, t);
        if (pattern == A_PATTERND) {
            aux[2] = (int64_t)D.sym[S_START];
            aux[3] = 1;
        } else {
            *t_io = t;
            return pattern == A_NOPATTERN ? R_NO_PATTERN : R_END_OF_SIGNAL;
        }
    }

    for (;;) {
        const int pattern = listen_symbol_ask(D, t);
        if (pattern <= A_NOPATTERN) {
            *t_io = t;
            return R_END_OF_SIGNAL;
        }

        const bool frame_end = pattern == A_PATTERNF;
        const bool truncate_error =
            !frame_end && stream[ST_BYTES] == max_frame_size;

        if (frame_end || truncate_error) {
            *t_io = t;
            if (stream[ST_BYTES] > 0 || stream[ST_BITS] == 4) {
                if (stream[ST_BITS] == 4)
                    buf[stream[ST_BYTES]++] = (uint8_t)stream[ST_DATA];
                aux[0] = truncate_error ? 1 : 0;
                return R_FRAME;
            }
            // spurious SoF; retry frame search (NfcA.cpp:653)
            return R_FRAME_SEARCH;
        }

        if (D.sym[S_EDGE] != 0.0)
            aux[1] = (int64_t)D.sym[S_EDGE];

        const int64_t value = (int64_t)D.sym[S_VALUE];
        if (stream[ST_BITS] < 8) {
            stream[ST_DATA] |= value << stream[ST_BITS];
            stream[ST_BITS] += 1;
        } else if (stream[ST_BYTES] < max_frame_size) {
            buf[stream[ST_BYTES]++] = (uint8_t)stream[ST_DATA];
            if (!fsm_check_parity((uint64_t)stream[ST_DATA],
                                  (uint64_t)value))
                stream[ST_FLAGS] |= FLAG_PARITY_ERROR;
            stream[ST_DATA] = 0;
            stream[ST_BITS] = 0;
        } else {
            *t_io = t;
            return R_RESET;
        }
    }
}

// BPSK listen frame loop (nfca.py:785-838; NfcA.cpp:690-803).
// aux: [0] = truncated, [1] = frame_end (out, symbol end on R_FRAME),
//      [2] = frame_start, [3] = 1 if SoF was found this call.
// bpsk_c_io: telescoped phase-integrator constant (in/out).
// Returns R_FRAME, R_RESET (both: caller resets modulation), R_NO_PATTERN,
// or R_END_OF_SIGNAL.
int32_t nfclab_a_listen_bpsk_frame(
    const float *bp, int64_t p_d,
    const float *mdepth, const float *deviation, int64_t n,
    const int32_t *par, double *mod, double *sym,
    int64_t guard_end, int64_t waiting_end,
    float min_deep, int32_t etu, int64_t max_frame_size, int32_t have_start,
    double *bpsk_c_io,
    int64_t *t_io, int64_t *stream, uint8_t *buf, int64_t *aux)
{
    ADecode D {nullptr, nullptr, bp, 0, 0, 0, p_d, mdepth, deviation,
               n, par, mod, sym, guard_end, waiting_end, min_deep, etu,
               *bpsk_c_io};
    int64_t t = *t_io;

    if (!have_start) {
        const int pattern = listen_start_bpsk(D, t);
        *bpsk_c_io = D.bpsk_c;
        if (pattern == A_PATTERNS) {
            aux[2] = (int64_t)D.sym[S_START];
            aux[3] = 1;
        } else {
            *t_io = t;
            return pattern == A_NOPATTERN ? R_NO_PATTERN : R_END_OF_SIGNAL;
        }
    }

    for (;;) {
        const int pattern = listen_symbol_bpsk(D, t);
        if (pattern <= A_NOPATTERN) {
            *t_io = t;
            return R_END_OF_SIGNAL;
        }

        const bool frame_end = pattern == A_PATTERNO;
        const bool truncate_error =
            !frame_end && stream[ST_BYTES] == max_frame_size;

        if (frame_end || truncate_error) {
            *t_io = t;
            if (stream[ST_BITS] == 9) {
                buf[stream[ST_BYTES]++] = (uint8_t)stream[ST_DATA];
                // last byte has even parity (NfcA.cpp:728-735)
                if (fsm_check_parity((uint64_t)stream[ST_DATA],
                                     (uint64_t)stream[ST_PARITY]))
                    stream[ST_FLAGS] |= FLAG_PARITY_ERROR;
            }
            if (stream[ST_BYTES] > 0) {
                aux[0] = truncate_error ? 1 : 0;
                aux[1] = (int64_t)D.sym[S_END];
                return R_FRAME;
            }
            return R_RESET;
        }

        const int64_t value = (int64_t)D.sym[S_VALUE];
        if (stream[ST_BITS] < 8) {
            stream[ST_DATA] |= value << stream[ST_BITS];
        } else if (stream[ST_BITS] < 9) {
            stream[ST_PARITY] = value;
        } else {
            buf[stream[ST_BYTES]++] = (uint8_t)stream[ST_DATA];
            if (!fsm_check_parity((uint64_t)stream[ST_DATA],
                                  (uint64_t)stream[ST_PARITY]))
                stream[ST_FLAGS] |= FLAG_PARITY_ERROR;
            stream[ST_DATA] = value;
            stream[ST_BITS] = 0;
        }
        stream[ST_BITS] += 1;
    }
}

} // extern "C"
