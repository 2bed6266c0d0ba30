// Shared state layouts for the native FSM kernels.
//
// Modulation state is marshaled from Python ModulationStatus objects as a
// flat double array; stream (bit-assembly) state as a small int64 array plus
// a byte buffer.  Layouts must match nfclab/runtime/native_walk.py.

#ifndef NFCLAB_FSM_COMMON_H
#define NFCLAB_FSM_COMMON_H

#include <cstdint>

// modulation state (doubles)
enum {
    M_MODE = 0,
    M_SEARCH_START,
    M_SEARCH_END,
    M_SEARCH_SYNC,
    M_PULSE_WIDTH,
    M_VALUE_THR,
    M_LAST_PHASE,
    M_LAST_VALUE,
    M_SYNC_VALUE,
    M_CORR0,
    M_SYM_START,
    M_SYM_END,
    M_CORR_PEAK_V,
    M_CORR_PEAK_T,
    M_DET_PEAK_V,
    M_DET_PEAK_T,
    M_CORR_D,
    M_CORR1,
    M_RISE_TIME,
    M_PHASE_THR,
    M_FIELDS
};

// bitrate params (int32)
enum { P_D = 0, P_P0, P_P1, P_P2, P_P4, P_P8, P_PRE1, P_FIELDS };

// symbol result (doubles; written by symbol decoders for the Python side)
enum {
    S_PATTERN = 0,
    S_VALUE,
    S_START,
    S_END,
    S_EDGE,
    S_FIELDS
};

// stream (bit assembly) state (int64)
enum {
    ST_PREVIOUS = 0,
    ST_PATTERN,
    ST_BITS,
    ST_SKIP,
    ST_DATA,
    ST_FLAGS,
    ST_PARITY,
    ST_BYTES,
    ST_FIELDS
};

// frame-level result codes
enum {
    R_END_OF_SIGNAL = 0,  // ran out of samples; state preserved
    R_FRAME = 1,          // frame completed; bytes in stream buffer
    R_RESET = 2,          // resetModulation (unlock) — caller applies
    R_FRAME_SEARCH = 3,   // resetFrameSearch (retry SoF) — caller applies
    R_NO_PATTERN = 4,     // listen-start timeout/abort (NoPattern)
    R_SOF = 5,            // listen SoF found; caller sets frame start
};

// frame flags (must match core/frame.py FrameFlags)
enum {
    FLAG_SHORT = 0x01,
    FLAG_ENCRYPTED = 0x02,
    FLAG_TRUNCATED = 0x08,
    FLAG_PARITY_ERROR = 0x10,
    FLAG_CRC_ERROR = 0x20,
    FLAG_SYNC_ERROR = 0x40,
};

// On-the-fly detect SD reads from a box channel (replaces dense sd arrays —
// which cost fresh-page memory per sample on growing streams; zero below the
// first clock with full window history, matching the dense formulation).
inline float fsm_sd_af(const float *box, int64_t t, int64_t d, int64_t p1,
                       int64_t p2)
{
    if (t < d + p1)
        return 0.0f;
    const int64_t u = t - d;
    const int64_t gap = p1 - p2;
    const float a0 = box[u];
    const float a1 = box[u - gap];
    const float a2 = box[u - 1];
    return ((a0 - a1) - (a1 - a2)) / (float)p2;
}

inline float fsm_sd_v(const float *box, int64_t t, int64_t d, int64_t p1,
                      int64_t p2)
{
    if (t < d + p1)
        return 0.0f;
    const int64_t u = t - d;
    return (box[u - (p1 - p2)] - box[u]) / (float)p2;
}

inline bool fsm_check_parity(uint64_t value, uint64_t parity)
{
    for (int i = 0; i < 8; i++)
        if (value & (1u << i))
            parity ^= 1;
    return parity != 0;
}

// On-the-fly derived listen channels (mirror core/streamview.DerivedView):
// the dense s0q_t/pb4_t/vq_t arrays are pure per-clock expressions over a
// box channel, so FSMs compute them inline — one f32 op, bit-identical to
// the former dense builders (same operands, same single subtract).

// sub: out[t] = bq[t - oa] - bq[t - ob], zero below lo
inline float fsm_derived_sub(const float *bq, int64_t t, int64_t oa,
                             int64_t ob, int64_t lo)
{
    return (t < lo) ? 0.0f : bq[t - oa] - bq[t - ob];
}

// delayed copy: out[t] = bp[t - d], zero below d
inline float fsm_derived_at(const float *bp, int64_t t, int64_t d)
{
    return (t < d) ? 0.0f : bp[t - d];
}

#endif
