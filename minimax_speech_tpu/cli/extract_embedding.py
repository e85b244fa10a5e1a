"""Batch speaker-embedding extraction.

Replaces the reference's campplus-ONNX x-vector extractor
(reference: speech/tools/extract_embedding.py): embeds each wav with the
LearnableSpeakerEncoder (the active conditioning path,
config.yaml use_speaker_encoder: True) and writes <stem>_spk.npy.
Precomputed campplus vectors remain usable at train/inference time via
SpeechLM.project_xvector / FlowModel embedding input.

  python -m minimax_speech_tpu.cli.extract_embedding --dir DATA \
      --ckpt llm.npz [--source llm|flow]
"""
from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dir", type=str, default=None)
    p.add_argument("--file_list", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None)
    p.add_argument("--random_init", action="store_true")
    p.add_argument("--source", choices=["llm", "flow"], default="llm",
                   help="which model's speaker encoder to use")
    p.add_argument("--campplus", type=str, default=None,
                   help="campplus weights (.onnx or torch .pt/.bin): embed "
                        "with the CAM++ x-vector instead of the learnable "
                        "speaker encoder (reference: speech/tools/"
                        "extract_embedding.py, campplus ONNX)")
    p.add_argument("--skip_existing", action="store_true")
    p.add_argument("--process_index", type=int, default=None)
    p.add_argument("--process_count", type=int, default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu.cli.extract_fsq import collect_files
    from minimax_speech_tpu.data.pipeline import _load_audio
    from minimax_speech_tpu.models.speaker_encoder import (
        LearnableSpeakerEncoder, SpeakerEncoderConfig)
    from minimax_speech_tpu.ops import mel as mel_ops
    from minimax_speech_tpu.utils.params_io import load_params

    pi = args.process_index if args.process_index is not None \
        else jax.process_index()
    pc = args.process_count if args.process_count is not None \
        else jax.process_count()
    files = collect_files(args)[pi::pc]

    if args.campplus:
        from minimax_speech_tpu.models.campplus import (CAMPPlus,
                                                        CAMPPlusConfig)
        from minimax_speech_tpu.ops.kaldi_fbank import kaldi_fbank
        from minimax_speech_tpu.utils import convert
        if args.campplus.endswith(".onnx"):
            from minimax_speech_tpu.utils.onnx_reader import \
                read_onnx_initializers
            state = read_onnx_initializers(args.campplus)
        else:
            import torch
            state = {k: v.numpy() for k, v in torch.load(
                args.campplus, map_location="cpu").items()}
        cp_vars = convert.campplus_params(state)
        cp = CAMPPlus(CAMPPlusConfig())
        cp_apply = jax.jit(lambda f: cp.apply(cp_vars, f))

        done, failed = 0, []
        t0 = time.time()
        for path in files:
            out = path.with_name(path.stem + "_spk.npy")
            if args.skip_existing and out.exists():
                continue
            try:
                audio, sr = _load_audio(str(path))
                if sr != 16000:
                    n = int(round(len(audio) * 16000 / sr))
                    audio = np.interp(
                        np.linspace(0, 1, n, endpoint=False),
                        np.linspace(0, 1, len(audio), endpoint=False),
                        audio).astype(np.float32)
                feat = kaldi_fbank(jnp.asarray(audio))
                feat = feat - feat.mean(axis=0, keepdims=True)
                emb = cp_apply(feat[None])
                np.save(out, np.asarray(emb)[0])
                done += 1
            except Exception as e:
                print(f"FAILED {path}: {e}", file=sys.stderr)
                failed.append(str(path))
        print(f"[rank {pi}/{pc}] campplus embedded {done} files in "
              f"{time.time() - t0:.1f}s ({len(failed)} failed)")
        return

    model = LearnableSpeakerEncoder(SpeakerEncoderConfig())
    if args.ckpt:
        full = load_params(args.ckpt)
        params = {"params": full["params"]["speaker_encoder"]}
    elif args.random_init:
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 80)))
    else:
        raise SystemExit("need --ckpt or --random_init")
    apply = jax.jit(model.apply)

    done, failed = 0, []
    t0 = time.time()
    for path in files:
        out = path.with_name(path.stem + "_spk.npy")
        if args.skip_existing and out.exists():
            continue
        try:
            audio, sr = _load_audio(str(path))
            if sr != 24000:
                n = int(round(len(audio) * 24000 / sr))
                audio = np.interp(
                    np.linspace(0, 1, n, endpoint=False),
                    np.linspace(0, 1, len(audio), endpoint=False),
                    audio).astype(np.float32)
            mel = mel_ops.hifigan_log_mel(jnp.asarray(audio)).T[None]
            emb = apply(params, mel)
            np.save(out, np.asarray(emb)[0])
            done += 1
        except Exception as e:
            print(f"FAILED {path}: {e}", file=sys.stderr)
            failed.append(str(path))
    print(f"[rank {pi}/{pc}] embedded {done} files in {time.time() - t0:.1f}s "
          f"({len(failed)} failed)")


if __name__ == "__main__":
    main()
