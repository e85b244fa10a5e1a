"""Config system: YAML + dotted CLI overrides -> dataclass config tree.

One system replaces the reference's three (HyperPyYAML graph
instantiation in speech/, OmegaConf __base__ merging in flowae/, plain
yaml in dac-vae — SURVEY §5 config). Same core semantics kept:
  * the YAML names the module tree (sections map 1:1 to dataclasses)
  * CLI overrides as dotted paths ('lm.qwen.n_layers=12')
  * a `__base__` key merges a parent file recursively (flowae-style)

We deliberately do NOT execute YAML tags into python objects (the
hyperpyyaml !new:/!ref mechanism) — configs stay data; construction
happens in code, which keeps everything jit/static-shape friendly.
"""
from __future__ import annotations

import dataclasses
import re
from pathlib import Path
from typing import Any

import yaml

from minimax_speech_tpu.infer.pipeline import TTSConfig
from minimax_speech_tpu.models import dac_vae, hifigan
from minimax_speech_tpu.models import llm as llm_mod
from minimax_speech_tpu.models import qwen2
from minimax_speech_tpu.models import s3tokenizer as s3
from minimax_speech_tpu.models.cfm import CFMConfig
from minimax_speech_tpu.models.decoder_unet import DecoderUNetConfig
from minimax_speech_tpu.models.flow import FlowConfig
from minimax_speech_tpu.models.speaker_encoder import SpeakerEncoderConfig
from minimax_speech_tpu.models.upsample_encoder import UpsampleEncoderConfig


def load_yaml(path: str | Path) -> dict:
    path = Path(path)
    with open(path) as f:
        data = yaml.safe_load(f) or {}
    base = data.pop("__base__", None)
    if base:
        parent = load_yaml(path.parent / base)
        data = _merge(parent, data)
    return data


def _merge(base: dict, over: dict) -> dict:
    out = dict(base)
    for k, v in over.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def apply_overrides(data: dict, overrides: list[str]) -> dict:
    """'a.b.c=value' strings; values parsed as YAML scalars."""
    for ov in overrides:
        key, _, raw = ov.partition("=")
        val = yaml.safe_load(raw)
        if isinstance(val, str) and re.fullmatch(
                r"[+-]?(\d+(\.\d*)?|\.\d+)[eE][+-]?\d+", val):
            # pyyaml is YAML 1.1: "2e-3" (no dot) parses as a STRING and
            # crashes later in the optimizer; coerce ONLY scientific
            # notation (bare float() would also swallow 'nan'/'inf'/'1_5')
            val = float(val)
        node = data
        parts = key.strip().split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return data


def _build(dc_type, data: dict):
    """Recursively build a (frozen) dataclass from a dict, tolerating
    missing keys (defaults) and rejecting unknown ones."""
    if data is None:
        return dc_type()
    fields = {f.name: f for f in dataclasses.fields(dc_type)}
    kwargs: dict[str, Any] = {}
    for k, v in data.items():
        if k not in fields:
            raise KeyError(f"unknown config key {k} for {dc_type.__name__}")
        sub = _SUBCONFIGS.get((dc_type.__name__, k))
        if sub is not None and isinstance(v, dict):
            kwargs[k] = _build(sub, v)
        elif isinstance(v, list):
            kwargs[k] = tuple(tuple(x) if isinstance(x, list) else x
                              for x in v)
        else:
            kwargs[k] = v
    return dc_type(**kwargs)


_SUBCONFIGS = {
    ("TTSConfig", "lm"): llm_mod.LMConfig,
    ("TTSConfig", "flow"): FlowConfig,
    ("TTSConfig", "dac"): dac_vae.DACVAEConfig,
    ("TTSConfig", "hift"): hifigan.HiFTConfig,
    ("TTSConfig", "s3"): s3.S3TokenizerConfig,
    ("LMConfig", "qwen"): qwen2.Qwen2Config,
    ("LMConfig", "speaker"): SpeakerEncoderConfig,
    ("FlowConfig", "encoder"): UpsampleEncoderConfig,
    ("FlowConfig", "unet"): DecoderUNetConfig,
    ("FlowConfig", "cfm"): CFMConfig,
    ("FlowConfig", "speaker"): SpeakerEncoderConfig,
}


def build_tts_config(data: dict) -> TTSConfig:
    model = {k: v for k, v in data.items()
             if k in {f.name for f in dataclasses.fields(TTSConfig)}}
    return _build(TTSConfig, model)


def load_tts_config(path: str | Path, overrides: list[str] = ()) -> TTSConfig:
    data = apply_overrides(load_yaml(path), list(overrides))
    return build_tts_config(data.get("model", data))
