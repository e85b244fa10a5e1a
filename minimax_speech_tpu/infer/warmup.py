"""Pre-compile the serving programs before taking traffic.

With the persistent executable cache (utils/compile_cache.py) these
compiles happen once per machine; afterwards a fresh serving process
deserializes them in seconds, the role the reference fills by shipping
prebuilt TRT engines + a torch.compile warmup pass
(reference: speech/cosyvoice/cli/model.py:call-path warmups,
utils/file_utils.py:53-129).

warm_serving() drives the REAL top-level surfaces (one-shot zero-shot
synthesis, the batched synthesizer, the continuous batcher, the
streaming session) with a synthetic speaker so exactly the programs
serving will run get compiled — nothing is traced twice thanks to
jit's cache, and all work happens on tiny-but-bucket-true shapes.
"""
from __future__ import annotations

import time

import numpy as np


def _dummy_speaker(tts, seconds: float = 1.0, name: str = "__warm__"):
    rng = np.random.default_rng(0)
    wav = (0.1 * rng.standard_normal(int(16000 * seconds))).astype(
        np.float32)
    tts.add_zero_shot_spk("warmup prompt text.", wav, name)
    return name


def warm_serving(tts, scheduler: str = "window", max_batch: int = 8,
                 slots: int = 4, streaming: bool = True,
                 text: str = "warm up the serving programs.",
                 verbose: bool = True) -> dict:
    """Compile the programs `cli.serve` will run. Returns phase timings."""
    timings = {}
    spk = _dummy_speaker(tts)
    info = tts.spk2info[spk]
    try:
        return _warm(tts, scheduler, max_batch, slots, streaming, text,
                     verbose, timings, spk, info)
    finally:
        # never leave the dummy speaker registered (a failed warmup
        # would otherwise advertise '__warm__' via list_available_spks)
        tts.spk2info.pop(spk, None)


def _warm(tts, scheduler, max_batch, slots, streaming, text, verbose,
          timings, spk, info):
    import jax

    from minimax_speech_tpu.infer.serving import BatchSynthesizer, Request

    def req():
        toks = tts.frontend.extract_text_tokens(
            tts.frontend.text_normalize(text, split=False)[0])
        return Request(
            text_tokens=toks,
            prompt_text_tokens=np.asarray(info["prompt_text_tokens"],
                                          np.int32),
            prompt_speech_tokens=np.asarray(info["prompt_tokens"],
                                            np.int32),
            prompt_feat=np.asarray(info["prompt_feat"]),
            lm_spk=np.asarray(info["lm_spk"]).reshape(-1),
            flow_emb=np.asarray(info["flow_emb"]).reshape(-1))

    # one-shot fused path (also used by /synthesize fallbacks + bench)
    t0 = time.perf_counter()
    for _ in tts.inference_zero_shot(text, "", None, zero_shot_spk_id=spk,
                                     stream=False, seed=0):
        pass
    timings["one_shot_s"] = time.perf_counter() - t0

    if scheduler == "continuous":
        from minimax_speech_tpu.infer.continuous import ContinuousBatcher
        t0 = time.perf_counter()
        cb = ContinuousBatcher(tts.pipeline, slots=slots,
                               key=jax.random.PRNGKey(0))
        cb.submit(req())
        ticks = 0
        while cb.busy():
            cb.tick()
            ticks += 1
            if ticks > 200:
                break
        timings["continuous_s"] = time.perf_counter() - t0
    else:
        synth = BatchSynthesizer(tts.pipeline)
        # every power-of-two batch bucket up to max_batch: arrival
        # counts pad up to these shapes, so this set IS the serving
        # compile set
        sizes, s = [], 1
        while s < max_batch:
            sizes.append(s)
            s *= 2
        sizes.append(s)  # the pow2 >= max_batch (batches pad up to it)
        for b in sorted(set(sizes)):
            t0 = time.perf_counter()
            synth.synthesize_batch([req() for _ in range(b)],
                                   key=jax.random.PRNGKey(0))
            timings[f"batch{b}_s"] = time.perf_counter() - t0

    if streaming:
        t0 = time.perf_counter()
        for _ in tts.inference_zero_shot(text, "", None,
                                         zero_shot_spk_id=spk,
                                         stream=True, seed=0):
            pass
        timings["streaming_s"] = time.perf_counter() - t0

    if verbose:
        total = sum(timings.values())
        print(f"[warmup] {total:.1f}s total: " + ", ".join(
            f"{k}={v:.1f}s" for k, v in timings.items()))
    return timings
