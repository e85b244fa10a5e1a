"""Training CLI: `python -m minimax_speech_tpu.cli.train --model {llm,flow}`.

Replaces the reference harness (reference: speech/train.py:41-321):
config + overrides, dataset pipeline, mesh + sharded train state,
epoch loop with periodic checkpointing, resume. Multi-host launch uses
jax.distributed.initialize() (the torchrun/NCCL equivalent); data
sharding by process replicates the rank::world split.
"""
from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=["llm", "flow"], required=True)
    p.add_argument("--config", type=str, default="configs/default.yaml")
    p.add_argument("--override", action="append", default=[],
                   help="dotted config overrides, e.g. train.lr=1e-5")
    p.add_argument("--train_data", type=str, required=True,
                   help="file with one wav path per line")
    p.add_argument("--cv_data", type=str, default=None)
    p.add_argument("--model_dir", type=str, required=True)
    p.add_argument("--tokenizer_path", type=str, default=None)
    p.add_argument("--init_ckpt", type=str, default=None,
                   help=".npz params to start from (e.g. converted ref ckpt)")
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--dp", type=int, default=None,
                   help="data-parallel extent (default: n_devices // tp)")
    p.add_argument("--max_epoch", type=int, default=None)
    p.add_argument("--distributed", action="store_true")
    p.add_argument("--coordinator", type=str, default=None,
                   help="coordinator host:port for jax.distributed "
                        "(with --num_processes/--process_id; omit to "
                        "auto-detect from the cluster environment)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (e.g. cpu) before device "
                        "init — needed because sitecustomize-registered "
                        "backends ignore the JAX_PLATFORMS env var")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 forward/backward (fp32 optimizer)")
    p.add_argument("--dpo", action="store_true",
                   help="DPO fine-tuning (llm only): requires "
                        "<stem>_fsq_reject sidecars; the frozen reference "
                        "policy is --ref_ckpt (default: --init_ckpt)")
    p.add_argument("--ref_ckpt", type=str, default=None)
    p.add_argument("--prefetch", type=int, default=2,
                   help="batches prepared ahead in a background thread "
                        "(0 disables; overlaps host data prep with "
                        "device steps)")
    p.add_argument("--export_npz", type=str, default=None,
                   help="also write final params as a flat .npz (the "
                        "interchange format the inference CLIs load)")
    p.add_argument("--latent_stats", type=str, default=None,
                   help="latent_stats.json from cli.extract_dac_latents "
                        "(flow only): sets model.flow.latent_mean/std so "
                        "the CFM solves in standardized latent space — "
                        "copy the same stats into the serving config")
    return p.parse_args(argv)


def build_stages(cfg_train, tokenizer, model_kind: str,
                 dpo: bool = False, static_shapes: bool = False):
    """static_shapes=True (multi-host SPMD): fixed batch size + fixed
    sequence pads so every host compiles and runs the SAME program each
    step (train.batch_size / train.pad_tokens / train.pad_seq /
    train.pad_ref)."""
    from minimax_speech_tpu.data import pipeline as dp
    stages = [
        lambda it: dp.individual_file_opener(it),
        lambda it: dp.tokenize(it, tokenizer),
        dp.filter_lengths,
        dp.resample,
        dp.extract_reference_mel,
        lambda it: dp.shuffle(it, 1000),
        lambda it: dp.sort_by_len(it, 500),
    ]
    if static_shapes:
        # over-long (and dpo-incomplete) samples must go BEFORE
        # batching: a late drop inside the padding stages would shrink
        # one host's batch and desynchronize the SPMD step
        max_len = (cfg_train.get("pad_seq", 1024) if model_kind == "llm"
                   else cfg_train.get("pad_tokens", 512))
        stages.append(lambda it: dp.filter_static_shapes(
            it, model_kind, max_len, dpo=dpo))
        stages.append(lambda it: dp.static_batch(
            it, cfg_train.get("batch_size", 8), drop_last=True))
        pad_ref = cfg_train.get("pad_ref", 224)
        if model_kind == "llm":
            stages.append(lambda it: dp.padding_llm(
                it, dpo=dpo,
                bistream_prob=cfg_train.get("bistream_prob", 0.5),
                pad_to=cfg_train.get("pad_seq", 1024), pad_ref=pad_ref))
        else:
            stages.append(lambda it: dp.padding_flow(
                it, pad_tokens=cfg_train.get("pad_tokens", 512),
                pad_ref=pad_ref))
        return stages
    stages.append(lambda it: dp.dynamic_batch(
        it, cfg_train.get("max_frames_in_batch", 25000)))
    if model_kind == "llm":
        stages.append(lambda it: dp.padding_llm(
            it, dpo=dpo,
            bistream_prob=cfg_train.get("bistream_prob", 0.5)))
    else:
        stages.append(lambda it: dp.padding_flow(it))
    return stages


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    if args.distributed:
        from minimax_speech_tpu.utils import distributed as dist_utils
        dist_utils.initialize(args.coordinator, args.num_processes,
                              args.process_id)

    import jax.numpy as jnp

    from minimax_speech_tpu import config as cfg_lib
    from minimax_speech_tpu.data import pipeline as dp
    from minimax_speech_tpu.infer.frontend import get_tokenizer
    from minimax_speech_tpu.models import llm as llm_mod
    from minimax_speech_tpu.models.flow import FlowModel, init_flow_variables
    from minimax_speech_tpu.parallel import mesh as mesh_lib
    from minimax_speech_tpu.train import schedule, steps
    from minimax_speech_tpu.train.checkpoint import CheckpointManager
    from minimax_speech_tpu.train.executor import Executor
    from minimax_speech_tpu.utils.logging import MetricsLogger
    from minimax_speech_tpu.utils.params_io import load_params

    data = cfg_lib.apply_overrides(cfg_lib.load_yaml(args.config),
                                   args.override)
    if args.latent_stats:
        import json
        stats = json.loads(Path(args.latent_stats).read_text())
        data = cfg_lib.apply_overrides(data, [
            "model.flow.latent_mean=" + json.dumps(stats["mean"]),
            "model.flow.latent_std=" + json.dumps(stats["std"])])
    tts_cfg = cfg_lib.build_tts_config(data.get("model", {}))
    tcfg = data.get("train", {})

    devices = jax.devices()
    if args.dp is not None:
        devices = devices[: args.dp * args.tp]
    mesh = mesh_lib.make_mesh(dp=args.dp, tp=args.tp, devices=devices)
    if mesh.size > 1:
        # splash attention runs per-device under shard_map on this mesh
        # (kernels/splash.py); without this, auto mode would fall back
        # to the XLA path that materializes (B, H, T, T) fp32 scores
        from minimax_speech_tpu.kernels import splash as splash_lib
        splash_lib.set_attention_mesh(mesh)
    tokenizer = get_tokenizer(args.tokenizer_path)

    key = jax.random.PRNGKey(1986)
    if args.model == "llm":
        model = llm_mod.SpeechLM(tts_cfg.lm)
        variables = (load_params(args.init_ckpt) if args.init_ckpt
                     else jax.jit(llm_mod.init_lm_variables,
                                  static_argnums=0)(model, key))
        if args.dpo:
            # frozen reference policy (reference: train.py:209-210,273-288)
            from minimax_speech_tpu.train import gan_steps
            ref = (load_params(args.ref_ckpt) if args.ref_ckpt
                   else variables)
            step_fn = gan_steps.make_dpo_step(model, ref["params"])
        else:
            step_fn = steps.make_lm_train_step(model, bf16=args.bf16)
        needs_key = False
    else:
        model = FlowModel(tts_cfg.flow)
        variables = (load_params(args.init_ckpt) if args.init_ckpt
                     else jax.jit(init_flow_variables,
                                  static_argnums=0)(model, key))
        step_fn = steps.make_flow_train_step(model, bf16=args.bf16)
        needs_key = True

    tx = schedule.make_optimizer(
        lr=tcfg.get("lr", 5e-5), warmup_steps=tcfg.get("warmup_steps", 500),
        scheduler=tcfg.get("scheduler", "constantlr"),
        grad_clip=tcfg.get("grad_clip", 1.0),
        accum_steps=tcfg.get("accum_grad", 1))
    state = steps.make_train_state(variables["params"], tx, mesh,
                                   kind=args.model)

    logger = MetricsLogger(args.model_dir, name=args.model,
                           log_interval=tcfg.get("log_interval", 5))
    ckpt = CheckpointManager(str(Path(args.model_dir) / "ckpt"))
    state, start_step = ckpt.restore(state)
    if start_step:
        print(f"resumed from step {start_step}")

    # the speaker encoder runs INSIDE the train step (jointly trained for
    # the LM, frozen for flow — see train/steps.py), so batches pass the
    # reference mels straight through
    if args.model == "llm":
        allowed_keys = {"src_type", "tok_id", "target", "seq_len",
                        "reference_mel", "reference_mel_len"}
        if args.dpo:
            allowed_keys |= {"src_type_rej", "tok_id_rej", "target_rej",
                             "seq_len_rej"}
    else:
        allowed_keys = {"token", "token_len", "feat", "feat_len",
                        "reference_mel", "reference_mel_len"}

    dp_size = mesh.shape["dp"]
    multi_host = jax.process_count() > 1
    sharding = mesh_lib.batch_sharding(mesh)

    if multi_host:
        # every host contributes an equal local slice of the global
        # batch (DataList already gave each process disjoint items);
        # static_shapes batching guarantees matching local shapes
        local_b = tcfg.get("batch_size", 8)
        assert (local_b * jax.process_count()) % dp_size == 0, (
            f"global batch {local_b}x{jax.process_count()} must divide "
            f"the dp extent {dp_size}")

        def put(batch):
            batch = {k: np.asarray(v) for k, v in batch.items()
                     if k in allowed_keys}
            return {k: jax.make_array_from_process_local_data(sharding, v)
                    for k, v in batch.items()}
    else:
        def put(batch):
            batch = {k: v for k, v in batch.items() if k in allowed_keys}
            b = next(iter(batch.values())).shape[0]
            keep = (b // dp_size) * dp_size
            if keep == 0:
                return None  # remainder batch smaller than the dp extent
            if keep != b:
                batch = {k: v[:keep] for k, v in batch.items()}
            # keep host numpy until the single device_put: jnp.asarray
            # first would upload to the default device and then reshard
            # (two transfers per step)
            batch = {k: np.asarray(v) for k, v in batch.items()}
            return jax.device_put(batch, sharding)

    ex = Executor(steps.jit_step(step_fn), state, logger, ckpt,
                  save_per_step=tcfg.get("save_per_step", 2000),
                  needs_key=needs_key, put_batch=put)

    items = [{"src": line.strip()} for line in
             Path(args.train_data).read_text().splitlines() if line.strip()]
    source = dp.DataList(items, process_index=jax.process_index(),
                         process_count=jax.process_count())
    stages = build_stages(tcfg, tokenizer, args.model,
                          dpo=args.dpo, static_shapes=multi_host)

    cv_source = None
    if args.cv_data:
        cv_items = [{"src": line.strip()} for line in
                    Path(args.cv_data).read_text().splitlines()
                    if line.strip()]
        # cv is not partitioned across processes (reference:
        # dataset.py:152-153 — every rank evaluates the same data)
        cv_source = dp.DataList(cv_items, shuffle=False, partition=False)

    # cv reuses the training loss (incl. in-step speaker conditioning)
    if args.model == "llm":
        lm_loss = jax.jit(steps.make_lm_loss_fn(model))

        def cv_loss(state, batch):
            loss, acc = lm_loss(state.params, batch)
            return {"loss": loss, "acc": acc}
    else:
        flow_loss = jax.jit(steps.make_flow_loss_fn(model))

        def cv_loss(state, batch, key):
            return {"loss": flow_loss(state.params, batch, key)}

    max_epoch = args.max_epoch or tcfg.get("max_epoch", 2000)
    # epoch-level resume: a checkpoint restores step/params but the loop
    # below counted from 0 on every restart, so a preempted/relaunched
    # run re-trained ANOTHER max_epoch epochs — and a run whose single
    # attempt can't fit max_epoch epochs never finished. Completed-epoch
    # state persists per run identity (the train config + max_epoch, so
    # a follow-on stage with different budget/lr — e.g. a low-LR polish
    # pass reusing the same model_dir — still starts at epoch 0).
    import hashlib
    import json as json_lib
    run_key = hashlib.sha256(json_lib.dumps(
        [tcfg, max_epoch], sort_keys=True, default=str
    ).encode()).hexdigest()[:16]
    ep_path = Path(args.model_dir) / "epoch_state.json"
    start_epoch = 0
    if start_step and ep_path.exists():
        try:
            es = json_lib.loads(ep_path.read_text())
            if es.get("key") == run_key:
                # the restored checkpoint can lag the epoch-state write
                # by up to save_per_step steps; roll the resume point
                # back by the lag (>=1 step/epoch assumption) so we
                # never SKIP epochs the restored params never trained —
                # re-training a few epochs is safe, skipping is not
                lag = max(0, int(es.get("step", 0)) - int(start_step))
                start_epoch = max(0, int(es["epoch"]) + 1 - lag)
                print(f"resuming at epoch {start_epoch}/{max_epoch}")
        except (ValueError, KeyError):  # partial write: start over
            pass
    for epoch in range(start_epoch, max_epoch):
        source.set_epoch(epoch)
        batches = dp.prefetch(dp.build_dataset(source, stages),
                              depth=args.prefetch)
        if multi_host:
            # uneven-workload join: yield only batches every host can
            # match step-for-step (reference: train_utils.py:285-304)
            from minimax_speech_tpu.utils import distributed as dist_utils
            batches = dist_utils.uneven_join_batches(batches)
        ex.train_one_epoch(batches)
        logger.log(ex.step, {"epoch": epoch}, force=True)
        if jax.process_index() == 0:
            # atomic (tmp+rename): a kill mid-write must not corrupt the
            # resume point; epoch state only counts an epoch whose steps
            # are at least checkpoint-recoverable next save
            tmp = ep_path.with_suffix(".json.tmp")
            tmp.write_text(json_lib.dumps({"key": run_key,
                                           "epoch": epoch,
                                           "step": ex.step}))
            tmp.replace(ep_path)
        if cv_source is not None:
            cv_batches = dp.build_dataset(cv_source, stages)
            ex.cv(cv_batches, cv_loss)
    ckpt.save(ex.step, ex.state)
    ckpt.wait()
    if args.export_npz:
        from minimax_speech_tpu.utils.params_io import save_params
        params = ex.state.params
        if multi_host:
            # all-gather tp-sharded params to replicated so every shard
            # is host-addressable, then write on rank 0 only
            rep = mesh_lib.replicated(mesh)
            specs = jax.tree_util.tree_map(lambda _: rep, params)
            params = jax.jit(lambda p: p, out_shardings=specs)(params)
        if jax.process_index() == 0:
            save_params(args.export_npz,
                        {"params": jax.device_get(params)})
            print(f"exported params to {args.export_npz}")


if __name__ == "__main__":
    main()
