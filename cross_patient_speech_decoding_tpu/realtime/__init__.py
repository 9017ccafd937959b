"""Realtime (closed-loop) streaming decode: DSP -> windowed GRU -> CTC."""

from cross_patient_speech_decoding_tpu.realtime.simulator import (
    RealtimeConfig,
    RealtimeState,
    init_realtime_state,
    make_realtime_step,
    simulate_stream,
)
