"""FSQ speech-token extraction CLI — s3tokenizer-CLI-compatible.

Mirrors the reference console tool (reference:
speech/tools/S3Tokenizer/s3tokenizer/cli.py:44-388): scan a directory
or take --file_list, tokenize every wav, write one token file per wav
(<stem>_fsq.npy), --skip_existing, failed-file list. Multi-host
sharding replicates the rank::world modulo split via
--process_index/--process_count (the torchrun/NCCL equivalent;
jax.process_index() is used when launched under jax.distributed).

Usage:
  python -m minimax_speech_tpu.cli.extract_fsq --dir DATA [--ckpt params.npz]
  python -m minimax_speech_tpu.cli.extract_fsq --file_list files.txt ...
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dir", type=str, default=None)
    p.add_argument("--file_list", type=str, default=None)
    p.add_argument("--ckpt", type=str, default=None,
                   help=".npz of flax params (see convert_checkpoint)")
    p.add_argument("--output_suffix", type=str, default="_fsq.npy")
    p.add_argument("--skip_existing", action="store_true")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--process_index", type=int, default=None)
    p.add_argument("--process_count", type=int, default=None)
    p.add_argument("--random_init", action="store_true",
                   help="random weights (smoke testing without a ckpt)")
    p.add_argument("--model_version", choices=["v2", "v1_25hz", "v1_50hz"],
                   default="v2",
                   help="v2 = FSQ (default); v1 = vanilla VQ at 25/50 Hz")
    p.add_argument("--config", type=str, default=None,
                   help="yaml whose model.s3 section sets the tokenizer "
                        "geometry (default: production S3TokenizerConfig)")
    return p.parse_args(argv)


def collect_files(args) -> list[Path]:
    if args.file_list:
        files = [Path(line.strip()) for line in
                 Path(args.file_list).read_text().splitlines() if line.strip()]
    elif args.dir:
        files = sorted(Path(args.dir).rglob("*.wav"))
    else:
        raise SystemExit("need --dir or --file_list")
    return files


def main(argv=None):
    args = parse_args(argv)
    import jax
    import jax.numpy as jnp

    from minimax_speech_tpu.data.pipeline import _load_audio
    from minimax_speech_tpu.models import s3tokenizer as s3
    from minimax_speech_tpu.ops import mel as mel_ops
    from minimax_speech_tpu.utils.params_io import load_params

    pi = args.process_index if args.process_index is not None \
        else jax.process_index()
    pc = args.process_count if args.process_count is not None \
        else jax.process_count()

    files = collect_files(args)[pi::pc]
    s3cfg = s3.S3TokenizerConfig()
    if args.config:
        from minimax_speech_tpu import config as cfg_lib
        s3cfg = cfg_lib.build_tts_config(
            cfg_lib.load_yaml(args.config).get("model", {})).s3
    if args.model_version == "v2":
        model = s3.S3TokenizerV2(s3cfg)
    else:
        stride = 2 if args.model_version == "v1_25hz" else 1
        model = s3.S3TokenizerV1(
            s3.S3TokenizerConfig(codebook_size=4096), stride=stride)
    if args.ckpt:
        variables = load_params(args.ckpt)
    elif args.random_init:
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 64, s3cfg.n_mels)),
                               jnp.array([64]))
    else:
        raise SystemExit("need --ckpt or --random_init")
    apply = jax.jit(model.apply)

    failed = []
    done = 0
    t0 = time.time()
    for path in files:
        out = path.with_name(path.stem + args.output_suffix)
        if args.skip_existing and out.exists():
            continue
        try:
            audio, sr = _load_audio(str(path))
            if sr != 16000:
                n_out = int(round(len(audio) * 16000 / sr))
                audio = np.interp(np.linspace(0, 1, n_out, endpoint=False),
                                  np.linspace(0, 1, len(audio),
                                              endpoint=False), audio)
            mel = np.asarray(mel_ops.whisper_log_mel(
                jnp.asarray(audio.astype(np.float32)))).T
            tokens = s3.quantize_long(lambda p, a, b: apply(p, a, b),
                                      variables, mel, mel.shape[0])
            np.save(out, np.asarray(tokens, np.int32))
            done += 1
        except Exception as e:  # log-and-continue like the reference
            print(f"FAILED {path}: {e}", file=sys.stderr)
            failed.append(str(path))
    if failed:
        Path(f"failed_files_rank{pi}.txt").write_text("\n".join(failed))
    dt = time.time() - t0
    print(f"[rank {pi}/{pc}] tokenized {done} files in {dt:.1f}s "
          f"({len(failed)} failed)")


if __name__ == "__main__":
    main()
