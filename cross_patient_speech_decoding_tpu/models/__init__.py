"""Model families: seq2seq RNNs, TCN, transformers, realtime CTC RNN."""

from cross_patient_speech_decoding_tpu.models.layers import (
    FusedGRU,
    FusedLSTM,
    StackedRNN,
    TemporalConv,
    PositionalEncoding,
    linear_decay_schedule,
    cosine_warmup_schedule,
)
from cross_patient_speech_decoding_tpu.models.seq2seq import (
    Seq2SeqRNN,
    SimpleGRU,
    TemporalConvRNN,
    EncoderRNN,
    DecoderRNN,
)
from cross_patient_speech_decoding_tpu.models.tcn_transformer import (
    TCNClassifier,
    TransformerClassifier,
    CNNTransformer,
)
from cross_patient_speech_decoding_tpu.models.realtime_rnn import (
    RealtimeRNN,
    reformat_time_windows,
    adjusted_input_lengths,
)
