from minimax_speech_tpu.ops import masks, mel, fsq, sampling, interpolate
