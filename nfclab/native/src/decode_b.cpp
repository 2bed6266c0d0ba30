// Native NFC-B decode-phase loops.
//
// Exact port of nfclab/demod/nfcb.py decode_poll_frame /
// decode_poll_symbol_ask / decode_listen_{start,symbol}_bpsk and the 9-bit
// NRZ frame assembly (themselves golden-exact transcriptions of
// tech/NfcB.cpp:453-1040).  The protocol layer (REQB/ATTRIB) stays in
// Python; modulation + symbol + stream state is marshaled once per
// frame-level call (layouts in fsm_common.h / runtime/native_walk.py).
//
#include <cmath>
#include <cstdint>

#include "fsm_common.h"

namespace {

// pattern codes (demod/nfcb.py:34-41; NfcB.cpp:37-47)
enum {
    B_INVALID = 0,
    B_NOPATTERN = 1,
    B_PATTERNL = 2,
    B_PATTERNH = 3,
    B_PATTERNS = 4,
    B_PATTERNM = 5,
    B_PATTERNN = 6,
    B_PATTERNO = 7,
};

// listen SoF search stages (NfcB.cpp:31-33)
enum { B_MODE_TR1 = 0, B_MODE_SOS_S1 = 1, B_MODE_SOS_S2 = 2 };

struct BDecode {
    const float *filt;     // DC-removed signal (sample-time indexed)
    const float *bp;       // BPSK product box channel (sample indexed)
    int64_t p_d;           // pb4[t] = bp[t-p_d], 0 below p_d (clock indexed)
    const float *mdepth;
    const float *deviation;
    int64_t n;
    const int32_t *par;    // P_FIELDS
    double *m;             // modulation state (M_FIELDS)
    double *sym;           // symbol state (S_FIELDS)
    int64_t guard_end;
    int64_t waiting_end;
    float min_deep;        // minimumModulationDeep (poll L/H slicer)
    float max_deep;        // maximumModulationDeep (listen abort)
    const int32_t *sos;    // [tr1_min, tr1_max, s1_min, s1_max, s2_min, s2_max]
};

// decode_poll_symbol_ask (nfcb.py:418-471; NfcB.cpp:684-762)
int poll_symbol_ask(BDecode &D, int64_t &t)
{
    const int32_t *p = D.par;
    double *m = D.m;
    const int64_t d = p[P_D];
    const int64_t p1 = p[P_P1], p2 = p[P_P2], p4 = p[P_P4];

    while (t + 1 < D.n) {
        t += 1;
        // nothing can change before the resync window opens or sync hits
        if (m[M_SEARCH_START] != 0.0 && (double)t <= m[M_SEARCH_START]) {
            int64_t target = (int64_t)m[M_SEARCH_START];
            const int64_t sync_m1 = (int64_t)m[M_SEARCH_SYNC] - 1;
            if (sync_m1 < target)
                target = sync_m1;
            if (target > t) {
                t = target;
                continue;
            }
        }

        const int64_t u = t - d;
        const float signal_edge = D.filt[u];
        const float signal_deep = D.mdepth[u];

        if (m[M_SEARCH_START] < (double)t && (double)t < m[M_SEARCH_END]) {
            const float edge = std::fabs(signal_edge);
            if (edge > (float)m[M_VALUE_THR] &&
                (float)m[M_DET_PEAK_V] < edge) {
                m[M_DET_PEAK_V] = edge;
                m[M_SEARCH_SYNC] = (double)(t + p2);
            }
        }

        if ((double)t != m[M_SEARCH_SYNC])
            continue;

        m[M_SYM_START] = m[M_SYM_END];
        m[M_SYM_END] = m[M_SEARCH_SYNC] + (double)p2;
        m[M_SEARCH_START] = m[M_SEARCH_SYNC] + (double)p4;
        m[M_SEARCH_END] = m[M_SEARCH_START] + (double)p2;
        m[M_SEARCH_SYNC] = m[M_SEARCH_SYNC] + (double)p1;
        m[M_DET_PEAK_V] = 0.0;

        D.sym[S_START] = m[M_SYM_START] - (double)d;
        D.sym[S_END] = m[M_SYM_END] - (double)d;
        if (signal_deep > D.min_deep) {
            D.sym[S_VALUE] = 0;
            D.sym[S_PATTERN] = B_PATTERNL;
        } else {
            D.sym[S_VALUE] = 1;
            D.sym[S_PATTERN] = B_PATTERNH;
        }
        return (int)D.sym[S_PATTERN];
    }
    return B_INVALID;
}

// decode_listen_start_bpsk (nfcb.py:545-660; NfcB.cpp:767-949).
// The two idle-skip helpers are replicated with the same comparisons so the
// walk is bit-identical to the Python event loop.
int listen_start_bpsk(BDecode &D, int64_t &t)
{
    const int32_t *p = D.par;
    double *m = D.m;
    const int64_t d = p[P_D];
    const int64_t p1 = p[P_P1], p2 = p[P_P2], p4 = p[P_P4];

    while (t + 1 < D.n) {
        t += 1;
        if (t < D.guard_end) {
            t = D.guard_end - 1;
            continue;
        }
        if (t == D.guard_end)
            m[M_VALUE_THR] = (double)D.deviation[t - d];
        if (t > D.waiting_end)
            return B_NOPATTERN;
        if (D.mdepth[t] > D.max_deep)
            return B_NOPATTERN;

        if ((double)t < m[M_SEARCH_START]) {
            // deep-abort and waiting checks precede the searchStart gate
            // (NfcB.cpp:811-825): jump only over clean spans, landing on the
            // first deep sample (whose own checks then fire)
            int64_t target = (int64_t)m[M_SEARCH_START] - 1;
            if (D.waiting_end < target)
                target = D.waiting_end;
            if (D.n - 1 < target)
                target = D.n - 1;
            int64_t nt = -1;
            for (int64_t k = t + 1; k <= target; k++) {
                if (D.mdepth[k] > D.max_deep) {
                    nt = k;
                    break;
                }
            }
            t = (nt >= 0) ? nt - 1 : target;
            continue;
        }

        const float phase = fsm_derived_at(D.bp, t, D.p_d);

        if (phase > (float)m[M_VALUE_THR]) {
            if (m[M_SYM_START] == 0.0)
                m[M_SYM_START] = (double)t;
            m[M_SEARCH_END] = (double)(t + p2);
        } else if ((int)m[M_MODE] == B_MODE_TR1 && m[M_SYM_START] == 0.0) {
            // TR1 idle: skip to the next candidate (phase crossing or abort)
            int64_t limit = D.waiting_end + 2;
            if (D.n < limit)
                limit = D.n;
            int64_t nt = -1;
            for (int64_t k = t + 1; k < limit; k++) {
                if (fsm_derived_at(D.bp, k, D.p_d) > (float)m[M_VALUE_THR] ||
                    D.mdepth[k] > D.max_deep) {
                    nt = k;
                    break;
                }
            }
            t = ((nt >= 0) ? nt : limit) - 1;
            continue;
        }

        if ((double)t != m[M_SEARCH_END] && phase > 0.0f)
            continue;

        const int state = (int)m[M_MODE];
        if (state == B_MODE_TR1) {
            const int64_t preamble_len = t - (int64_t)m[M_SYM_START];
            if (preamble_len < D.sos[0] || preamble_len > D.sos[1]) {
                m[M_MODE] = B_MODE_TR1;
                m[M_SEARCH_START] = 0.0;
                m[M_SEARCH_END] = 0.0;
                m[M_SYM_START] = 0.0;
                m[M_SYM_END] = 0.0;
                continue;
            }
            m[M_SYM_END] = (double)t;
            m[M_MODE] = B_MODE_SOS_S1;
            m[M_SEARCH_START] = (double)(t + p1 + p4);
            m[M_SEARCH_END] = 0.0;
            continue;
        }

        if (state == B_MODE_SOS_S1) {
            const int64_t s1_len = t - (int64_t)m[M_SYM_END];
            if (s1_len < D.sos[2] || s1_len > D.sos[3]) {
                m[M_MODE] = B_MODE_TR1;
                m[M_SEARCH_START] = 0.0;
                m[M_SEARCH_END] = 0.0;
                m[M_SYM_START] = 0.0;
                m[M_SYM_END] = 0.0;
                continue;
            }
            m[M_SYM_END] = (double)t;
            m[M_MODE] = B_MODE_SOS_S2;
            m[M_SEARCH_START] = (double)(t + p1 + p4);
            m[M_SEARCH_END] = 0.0;
            continue;
        }

        // B_MODE_SOS_S2
        const int64_t s2_len = t - (int64_t)m[M_SYM_END];
        if (s2_len < D.sos[4] || s2_len > D.sos[5]) {
            m[M_MODE] = B_MODE_TR1;
            m[M_SEARCH_START] = 0.0;
            m[M_SEARCH_END] = 0.0;
            m[M_SYM_START] = 0.0;
            m[M_SYM_END] = 0.0;
            continue;
        }

        m[M_SYM_END] = (double)t;
        m[M_SEARCH_SYNC] = (double)(t + p2);
        m[M_LAST_PHASE] = (double)phase;
        m[M_PHASE_THR] =
            (double)std::fabs((float)((float)m[M_DET_PEAK_V] * 0.25f));
        m[M_SEARCH_START] = 0.0;
        m[M_SEARCH_END] = 0.0;
        m[M_DET_PEAK_V] = 0.0;

        D.sym[S_VALUE] = 1;
        D.sym[S_START] = m[M_SYM_START] - (double)p1 - (double)d;
        D.sym[S_END] = m[M_SYM_END] - (double)p1 - (double)d;
        D.sym[S_PATTERN] = B_PATTERNS;
        return B_PATTERNS;
    }
    return B_INVALID;
}

// decode_listen_symbol_bpsk (nfcb.py:691-738; NfcB.cpp:954-1040)
int listen_symbol_bpsk(BDecode &D, int64_t &t)
{
    const int32_t *p = D.par;
    double *m = D.m;
    const int64_t d = p[P_D];
    const int64_t p1 = p[P_P1], p2 = p[P_P2];

    while (t + 1 < D.n) {
        t += 1;
        const float phase = fsm_derived_at(D.bp, t, D.p_d);

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
            return B_PATTERNO;

        m[M_SYM_START] = m[M_SYM_END];
        m[M_SYM_END] = m[M_SEARCH_SYNC] + (double)p2;
        m[M_SEARCH_SYNC] = m[M_SEARCH_SYNC] + (double)p1;
        m[M_LAST_PHASE] = (double)phase;
        m[M_DET_PEAK_T] = 0.0;

        if (phase < -(float)m[M_PHASE_THR]) {
            D.sym[S_VALUE] = 1.0 - D.sym[S_VALUE];
            D.sym[S_PATTERN] = ((int)D.sym[S_PATTERN] == B_PATTERNM)
                                   ? B_PATTERNN
                                   : B_PATTERNM;
        } else {
            m[M_PHASE_THR] = (double)(float)(phase * 0.25f);
        }

        D.sym[S_START] = m[M_SYM_START] - (double)p1 - (double)d;
        D.sym[S_END] = m[M_SYM_END] - (double)p1 - (double)d;
        return (int)D.sym[S_PATTERN];
    }
    return B_INVALID;
}

} // namespace

extern "C" {

// Poll frame loop (nfcb.py:339-416; NfcB.cpp:453-567).
// aux: [0] = truncated (stream or truncate error), [1] = frame_end
// (symbol end on R_FRAME).  Returns R_FRAME (caller emits + applies the
// partial modulation clear), R_RESET, or R_END_OF_SIGNAL.
int32_t nfclab_b_poll_frame(
    const float *filt, const float *mdepth, int64_t n,
    const int32_t *par, double *mod, double *sym,
    float min_deep, int64_t max_frame_size,
    int64_t *t_io, int64_t *stream, uint8_t *buf, int64_t *aux)
{
    BDecode D {filt, nullptr, 0, mdepth, nullptr, n, par, mod, sym,
               0, 0, min_deep, 0.0f, nullptr};
    int64_t t = *t_io;

    for (;;) {
        const int pattern = poll_symbol_ask(D, t);
        if (pattern <= B_NOPATTERN) {
            *t_io = t;
            return R_END_OF_SIGNAL;
        }

        bool frame_end = false, stream_error = false, truncate_error = false;
        bool skip_symbol = false;

        if (stream[ST_BITS] == 9 && stream[ST_DATA] == 0 &&
            pattern == B_PATTERNL)
            frame_end = true;
        else if (stream[ST_BITS] == 9 && pattern == B_PATTERNL)
            stream_error = true;
        else if (stream[ST_BITS] == 0 && pattern == B_PATTERNH &&
                 stream[ST_SKIP] == 6)
            stream_error = true;
        else if (stream[ST_BYTES] == max_frame_size)
            truncate_error = true;
        else if (stream[ST_BITS] == 0 && pattern == B_PATTERNH) {
            stream[ST_SKIP] += 1;
            skip_symbol = true;
        }

        if (skip_symbol)
            continue;

        if (frame_end || stream_error || truncate_error) {
            *t_io = t;
            if (stream[ST_BYTES] > 2) {
                aux[0] = (truncate_error || stream_error) ? 1 : 0;
                aux[1] = (int64_t)D.sym[S_END];
                return R_FRAME;
            }
            return R_RESET;
        }

        if (stream[ST_BITS] < 9) {
            if (stream[ST_BITS] > 0)
                stream[ST_DATA] |=
                    (int64_t)D.sym[S_VALUE] << (stream[ST_BITS] - 1);
            stream[ST_BITS] += 1;
        } else {
            buf[stream[ST_BYTES]++] = (uint8_t)stream[ST_DATA];
            stream[ST_DATA] = 0;
            stream[ST_BITS] = 0;
            stream[ST_SKIP] = 0;
        }
    }
}

// BPSK listen frame loop (nfcb.py:475-543; NfcB.cpp:572-679).
// aux: [0] = truncated, [1] = frame_end symbol end (caller adds the
// +352/fc EoS compensation), [2] = frame_start, [3] = 1 if SoF found.
// sos_bounds: [tr1_min, tr1_max, s1_min, s1_max, s2_min, s2_max].
// Returns R_FRAME / R_RESET (caller resets modulation), R_NO_PATTERN,
// or R_END_OF_SIGNAL.
int32_t nfclab_b_listen_frame(
    const float *bp, int64_t p_d,
    const float *mdepth, const float *deviation, int64_t n,
    const int32_t *par, double *mod, double *sym,
    const int32_t *sos_bounds,
    int64_t guard_end, int64_t waiting_end,
    float max_deep, int64_t max_frame_size, int32_t have_start,
    int64_t *t_io, int64_t *stream, uint8_t *buf, int64_t *aux)
{
    BDecode D {nullptr, bp, p_d, mdepth, deviation, n, par, mod, sym,
               guard_end, waiting_end, 0.0f, max_deep, sos_bounds};
    int64_t t = *t_io;

    if (!have_start) {
        const int pattern = listen_start_bpsk(D, t);
        if (pattern == B_PATTERNS) {
            aux[2] = (int64_t)D.sym[S_START];
            aux[3] = 1;
        } else {
            *t_io = t;
            return pattern == B_NOPATTERN ? R_NO_PATTERN : R_END_OF_SIGNAL;
        }
    }

    for (;;) {
        const int pattern = listen_symbol_bpsk(D, t);
        if (pattern <= B_NOPATTERN) {
            *t_io = t;
            return R_END_OF_SIGNAL;
        }

        bool frame_end = false, stream_error = false, truncate_error = false;
        if (stream[ST_BITS] == 9 && stream[ST_DATA] == 0 &&
            pattern == B_PATTERNM)
            frame_end = true;
        else if ((stream[ST_BITS] == 0 && pattern == B_PATTERNN) ||
                 (stream[ST_BITS] == 9 && pattern == B_PATTERNM))
            stream_error = true;
        else if (stream[ST_BYTES] == max_frame_size)
            truncate_error = true;

        if (frame_end || stream_error || truncate_error) {
            *t_io = t;
            if (stream[ST_BYTES] > 0) {
                aux[0] = (truncate_error || stream_error) ? 1 : 0;
                aux[1] = (int64_t)D.sym[S_END];
                return R_FRAME;
            }
            return R_RESET;
        }

        if (stream[ST_BITS] < 9) {
            if (stream[ST_BITS] > 0)
                stream[ST_DATA] |=
                    (int64_t)D.sym[S_VALUE] << (stream[ST_BITS] - 1);
            stream[ST_BITS] += 1;
        } else {
            buf[stream[ST_BYTES]++] = (uint8_t)stream[ST_DATA];
            stream[ST_DATA] = 0;
            stream[ST_BITS] = 0;
        }
    }
}

} // extern "C"
