"""minimax_speech_tpu — a TPU-native (JAX/XLA/Pallas) zero-shot TTS framework.

Re-implements the full capability surface of the "Learnable-Speech"
(CosyVoice2-derived) stack as an idiomatic JAX framework:

  * S3 FSQ speech tokenizer (Whisper-style encoder + finite scalar quantizer)
  * Stage-1 autoregressive speech-token LM (Qwen2-0.5B backbone)
  * Stage-2 flow-matching decoder (upsampling conformer + causal CFM UNet)
  * DAC-VAE continuous codec (Snake conv encoder/decoder)
  * HiFT NSF+iSTFT vocoder
  * Data pipeline, pjit/shard_map training, streaming inference sessions.

Layout:
  ops/       pure-function DSP + NN primitives (stft/mel, fsq, masks, sampling)
  kernels/   Pallas TPU kernels (flash attention w/ chunk masks, ...)
  models/    flax.linen model definitions
  parallel/  device mesh + sharding rules
  data/      data pipeline (processor stages, bucketing/batching)
  train/     train states, steps, schedules, checkpointing
  infer/     end-to-end synthesis pipeline + streaming sessions
  cli/       command-line entry points mirroring the reference CLIs
"""

__version__ = "0.1.0"
