"""Training CLI — the train_ds.py analog.

Capability parity with reference 2Haff/train_ds.py: flag surface
(SURVEY.md section 5.6), tokenizer + [SEG] token, LoRA config, dataset
selection (local shards or HF hub), per-epoch validation against the
benchmark dir with IoU/IoCM, best-IoU checkpointing with auto-resume,
meters + TensorBoard scalars.

TPU-first: one jitted train step over a jax.sharding mesh (DP/FSDP/TP via
parallel/sharding.py — the DeepSpeed ZeRO-2/NCCL replacement), optax
AdamW + WarmupDecayLR, optax.MultiSteps grad accumulation, jax.checkpoint
rematerialization, background-thread batch prefetch.

Usage: python -m haff_tpu.train.cli --dataset_dir D [--val_benchmark_dir B]
       [--model_preset tiny|1b|7b|13b] [--lora_r 8] [--epochs 10]
       [--steps_per_epoch 500] [--batch_size 2] [--grad_accum 10]
       [--lr 3e-4] [--log_dir runs/haff] [--auto_resume] ...
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import time

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    # model
    p.add_argument("--model_preset", default="7b")
    p.add_argument("--decoder", default="llama", choices=["llama", "mpt"])
    p.add_argument("--tokenizer", default=None)
    p.add_argument("--precision", default="bf16", choices=["bf16", "fp32"])
    p.add_argument("--image_size", type=int, default=1024)
    # Reference default (train_ds.py:52). Long 2HANDS narrations +
    # template + 255 image-token slots truncate identically this way.
    p.add_argument("--model_max_length", type=int, default=575)
    # lora
    p.add_argument("--lora_r", type=int, default=8)
    p.add_argument("--lora_alpha", type=float, default=16)
    p.add_argument("--lora_dropout", type=float, default=0.05)
    p.add_argument("--lora_target_modules", default="q_proj,v_proj",
                   help="comma-separated attention projections to adapt "
                        "(q_proj,k_proj,v_proj,o_proj)")
    # data (mixing surface mirrors reference train_ds.py --dataset /
    # --sample_rates; the affordance corpus is the live path, the others
    # are the optional pretraining corpora)
    p.add_argument("--dataset_dir", required=True,
                   help="2HANDS shards dir or HF repo id")
    p.add_argument("--dataset", default="affordance",
                   help='"||"-separated mix of affordance|sem_seg|'
                        'refer_seg|reason_seg|vqa')
    p.add_argument("--sample_rates", default="",
                   help="comma-separated weights per --dataset entry "
                        "(default: uniform)")
    p.add_argument("--sem_seg_data", default=None,
                   help="ADE20K-style dir (images/ + annotations/)")
    p.add_argument("--sem_seg_classes", default=None,
                   help="txt file with one class name per line")
    p.add_argument("--refer_seg_data", default=None,
                   help="dir with refs.json, instances.json, images/")
    p.add_argument("--reason_seg_data", default=None,
                   help="ReasonSeg dir (<split>/*.jpg + .json)")
    p.add_argument("--explanatory", type=float, default=-1.0,
                   help="ReasonSeg explanation-answer probability "
                        "(-1 = off, reference default 0.1)")
    p.add_argument("--vqa_data", default=None,
                   help="llava_instruct json path")
    p.add_argument("--vqa_image_dir", default=None)
    p.add_argument("--val_benchmark_dir", default=None)
    p.add_argument("--val_batch_size", type=int, default=1)
    p.add_argument("--samples_per_epoch", type=int, default=10000)
    # optimization (reference defaults: train_ds.py:34-122)
    p.add_argument("--epochs", type=int, default=10)
    p.add_argument("--workers", type=int, default=4,
                   help="prefetch worker threads (reference "
                   "train_ds.py --workers; the C++ host transforms "
                   "release the GIL, so threads scale with cores)")
    p.add_argument("--steps_per_epoch", type=int, default=500)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--grad_accum", type=int, default=10)
    p.add_argument("--lr", type=float, default=1e-3)  # train_ds.py:92
    p.add_argument("--beta1", type=float, default=0.9)
    p.add_argument("--beta2", type=float, default=0.95)
    p.add_argument("--warmup_steps", type=int, default=100)
    p.add_argument("--grad_clip", type=float, default=1.0)
    p.add_argument("--ce_loss_weight", type=float, default=1.0)
    p.add_argument("--dice_loss_weight", type=float, default=0.5)
    p.add_argument("--bce_loss_weight", type=float, default=2.0)
    p.add_argument("--taxonomy_logit_ce", action="store_true",
                   help="Single-softmax taxonomy CE (on pre-softmax "
                   "logits). Default off = reference-faithful "
                   "double-softmax (mask_decoder.py:172-178 + "
                   "LISA.py:415), which is a gradient trap for rare "
                   "taxonomy classes.")
    p.add_argument("--no_remat", action="store_true")
    p.add_argument("--load_in_8bit", action="store_true",
                   help="QLoRA-style: keep the frozen LLM base int8 in "
                        "HBM, dequantize inside the train step")
    p.add_argument("--load_in_4bit", action="store_true",
                   help="QLoRA-style int4 frozen base")
    # mesh
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--tensor", type=int, default=1)
    p.add_argument("--sp", type=int, default=1,
                   help="sequence-parallel mesh axis size; >1 runs "
                        "decoder attention as ring attention with the "
                        "sequence sharded over ICI "
                        "(parallel/ring_attention.py)")
    p.add_argument("--pp", type=int, default=1,
                   help="pipeline-parallel mesh axis size; >1 runs the "
                        "decoder layers as a GPipe pipeline of that "
                        "many stages (parallel/pipeline.py)")
    p.add_argument("--pp_microbatches", type=int, default=0,
                   help="GPipe microbatches per step (0 = auto, the "
                        "largest batch divisor <= 2*pp)")
    p.add_argument("--ep", type=int, default=1,
                   help="expert-parallel mesh axis size; shards MoE "
                        "expert weights (nn/moe.py) — only useful with "
                        "--moe_experts > 0")
    p.add_argument("--moe_experts", type=int, default=0,
                   help="Mixture-of-Experts decoder MLPs with this many "
                        "experts (0 = dense, the reference "
                        "architecture); experts+router become "
                        "trainable")
    p.add_argument("--moe_top_k", type=int, default=2)
    p.add_argument("--moe_every", type=int, default=1,
                   help="MoE layer interleave (1 = every layer, 2 = "
                        "every other)")
    # logging / ckpt
    p.add_argument("--exp_name", default="haff_tpu")
    p.add_argument("--log_base_dir", default="./runs")
    p.add_argument("--conv_type", default="llava_v1",
                   choices=["llava_v1", "llava_llama_2"])
    p.add_argument("--use_mm_start_end", action="store_true", default=True)
    p.add_argument("--no_mm_start_end", dest="use_mm_start_end",
                   action="store_false")
    p.add_argument("--train_mask_decoder", action="store_true",
                   default=True)
    p.add_argument("--no_train_mask_decoder", dest="train_mask_decoder",
                   action="store_false")
    p.add_argument("--train_vision_encoder", action="store_true",
                   help="unfreeze the SAM image encoder (beyond the "
                        "reference freeze set; for from-scratch runs "
                        "with no pretrained tower)")
    p.add_argument("--reset_mask_decoder", action="store_true",
                   help="re-initialize both mask decoders (reference "
                        "train_ds.py:245-256)")
    p.add_argument("--eval_only", action="store_true",
                   help="run one validation pass and exit")
    p.add_argument("--no_eval", action="store_true",
                   help="skip per-epoch validation")
    p.add_argument("--resume", default=None,
                   help="explicit checkpoint dir (overrides auto-resume)")
    p.add_argument("--pretrained_params", default=None,
                   help="converted params dir from tools/convert_cli "
                        "(initial weights, not a training resume)")
    p.add_argument("--vision_pretrained", default=None,
                   help="raw SAM .pth checkpoint; converted on the fly "
                        "with left/right decoder duplication (reference "
                        "--vision_pretrained)")
    p.add_argument("--start_epoch", type=int, default=None)
    p.add_argument("--auto_resume", action="store_true", default=True)
    p.add_argument("--no_auto_resume", dest="auto_resume",
                   action="store_false")
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--print_freq", type=int, default=10)
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from ..core.config import MeshConfig, ModelConfig, TrainConfig
    from ..core.mesh import build_mesh, maybe_initialize_distributed
    from ..data.aff_dataset import AffDataset, AffDatasetVal
    from ..data.collate import collate_affordance
    from ..data.loader import PrefetchLoader
    from ..data.tokenizer import load_tokenizer, seg_token_idx
    from ..model.lisa import LisaModel, TrainBatch
    from ..parallel.sharding import param_shardings, shard_batch_tree
    from .checkpoints import restore_checkpoint, save_checkpoint
    from .metrics import AverageMeter, MetricsLogger, ProgressMeter
    from .trainer import (
        count_params,
        init_train_state,
        make_train_step,
        merge_params,
        partition_params,
    )

    maybe_initialize_distributed()
    log_dir = os.path.join(args.log_base_dir, args.exp_name)
    ckpt_dir = os.path.join(log_dir, "ckpt_model")
    os.makedirs(log_dir, exist_ok=True)

    tok = load_tokenizer(args.tokenizer,
                         model_max_length=args.model_max_length)
    base = ModelConfig.preset(args.model_preset)
    cfg = base.replace(
        seg_token_idx=seg_token_idx(tok),
        decoder=args.decoder,
        ce_loss_weight=args.ce_loss_weight,
        dice_loss_weight=args.dice_loss_weight,
        bce_loss_weight=args.bce_loss_weight,
        taxonomy_logit_ce=args.taxonomy_logit_ce,
        llama=dataclasses.replace(
            base.llama, lora_rank=args.lora_r, lora_alpha=args.lora_alpha,
            lora_dropout=args.lora_dropout,
            lora_targets=tuple(
                m for m in args.lora_target_modules.split(",") if m),
            vocab_size=max(base.llama.vocab_size, len(tok) + 4),
            sequence_parallel=args.sp > 1,
            moe_num_experts=args.moe_experts, moe_top_k=args.moe_top_k,
            moe_every=args.moe_every),
    )
    tcfg = TrainConfig(
        model=cfg, lr=args.lr, beta1=args.beta1, beta2=args.beta2,
        warmup_steps=args.warmup_steps,
        total_steps=args.epochs * args.steps_per_epoch,
        epochs=args.epochs, steps_per_epoch=args.steps_per_epoch,
        batch_size=args.batch_size,
        grad_accumulation_steps=args.grad_accum,
        grad_clip_norm=args.grad_clip,
        pp_microbatches=args.pp_microbatches, seed=args.seed)

    if args.pp > 1 and args.sp > 1:
        raise SystemExit(
            "--pp cannot be combined with --sp (ring attention); "
            "use pp x tensor x data instead")
    if args.pp > 1 and args.moe_experts > 0:
        raise SystemExit(
            "--pp cannot be combined with --moe_experts (the GPipe "
            "engine stacks homogeneous per-layer params); use "
            "data x fsdp x ep x tensor instead")
    if args.moe_experts == 0 and args.ep > 1:
        raise SystemExit("--ep > 1 requires --moe_experts > 0")
    if args.moe_experts > 0 and args.moe_every < 1:
        raise SystemExit("--moe_every must be >= 1")
    if args.ep > 1 and args.moe_experts % args.ep != 0:
        raise SystemExit(
            f"--moe_experts {args.moe_experts} must be divisible by "
            f"--ep {args.ep} (stacked expert weights shard over the "
            "expert axis)")
    mesh = build_mesh(MeshConfig(data=-1, pp=args.pp, fsdp=args.fsdp,
                                 ep=args.ep, sp=args.sp,
                                 tensor=args.tensor))
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    model = LisaModel(cfg=cfg, dtype=dtype, remat=not args.no_remat)

    # Per-process seed offset shards the random sampling across hosts
    # (the DistributedSampler analog, reference train_ds.py:418-420).
    seed = args.seed + 1000 * jax.process_index()
    names = [n for n in args.dataset.split("||") if n]
    corpora = []
    for n in names:
        if n == "affordance":
            corpora.append(AffDataset(
                args.dataset_dir, samples_per_epoch=args.samples_per_epoch,
                seed=seed))
        elif n == "sem_seg":
            from ..data.seg_datasets import SemSegDataset

            with open(args.sem_seg_classes) as f:
                classes = [ln.strip() for ln in f if ln.strip()]
            corpora.append(SemSegDataset(args.sem_seg_data, classes,
                                         seed=seed))
        elif n == "refer_seg":
            from ..data.seg_datasets import ReferSegDataset

            refer_base = args.refer_seg_data
            corpora.append(ReferSegDataset(
                os.path.join(refer_base, "refs.json"),
                os.path.join(refer_base, "instances.json"),
                os.path.join(refer_base, "images"), seed=seed))
        elif n == "reason_seg":
            from ..data.extra_datasets import ReasonSegDataset

            corpora.append(ReasonSegDataset(
                args.reason_seg_data, seed=seed,
                explanatory=args.explanatory))
        elif n == "vqa":
            from ..data.extra_datasets import VqaDataset

            corpora.append(VqaDataset(args.vqa_data, args.vqa_image_dir,
                                      seed=seed))
        else:
            raise SystemExit(f"unknown dataset {n!r}")
    if len(corpora) == 1:
        ds = corpora[0]
    else:
        from ..data.extra_datasets import HybridDataset

        rates = ([float(r) for r in args.sample_rates.split(",")]
                 if args.sample_rates else [1.0] * len(corpora))
        ds = HybridDataset(corpora, rates,
                           samples_per_epoch=args.samples_per_epoch,
                           seed=seed)
    print(f"datasets: {names}; samples/epoch {args.samples_per_epoch}")

    def make_batch(_):
        samples = [ds[0] for _ in range(args.batch_size)]
        return collate_affordance(
            samples, tok, sam_image_size=cfg.sam_encoder.image_size,
            clip_image_size=cfg.clip.image_size,
            max_text_len=args.model_max_length, conv_type=args.conv_type,
            use_mm_start_end=args.use_mm_start_end)

    # --- init / shard params ---
    probe = make_batch(0)
    tb0 = TrainBatch(**{k: jnp.asarray(v) for k, v in probe.items()
                        if k != "resizes"})
    variables = jax.jit(model.init)(jax.random.PRNGKey(args.seed), tb0)
    boxed = variables["params"]
    shardings = param_shardings(mesh, boxed)
    params = nn.unbox(boxed)
    if args.pretrained_params:
        from .checkpoints import restore_params

        params = restore_params(args.pretrained_params, params)
        print(f"initialized from converted params "
              f"{args.pretrained_params}")
    if args.vision_pretrained:
        from ..tools.convert_weights import (convert_sam, load_state_dict,
                                             merge_into_init)

        sd = load_state_dict(args.vision_pretrained)
        params = merge_into_init(
            params, {"visual_model": convert_sam(
                sd, depth=cfg.sam_encoder.depth)})
        print(f"overlaid SAM weights from {args.vision_pretrained}")
    if args.reset_mask_decoder:
        # Fresh decoder weights (reference train_ds.py:245-256 reinit).
        refresh = nn.unbox(jax.jit(model.init)(
            jax.random.PRNGKey(args.seed + 7), tb0)["params"])
        for k in ("mask_decoder_left", "mask_decoder_right"):
            params["visual_model"][k] = refresh["visual_model"][k]
        print("mask decoders re-initialized")
    params = jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings)
    exclude = () if args.train_mask_decoder else (
        "mask_decoder_left", "mask_decoder_right")
    extra = ("moe",) if args.moe_experts > 0 else ()
    if args.train_vision_encoder:
        # Beyond the reference freeze set (train_ds.py:236-244 keeps the
        # SAM tower frozen because it starts from pretrained
        # sam_vit_h weights): unfreeze the SAM image encoder — needed
        # when training from scratch (no pretrained tower exists), e.g.
        # the round-4 real-data overfit demonstration.
        extra = extra + ("image_encoder",)
    trainable, frozen = partition_params(params, exclude, extra)
    print(f"trainable params: {count_params(trainable):,} / "
          f"{count_params(trainable) + count_params(frozen):,}")

    state = init_train_state(tcfg, trainable)
    start_epoch = 0
    if args.resume:
        state, step = restore_checkpoint(args.resume, state)
        if step is None:
            raise SystemExit(
                f"--resume {args.resume}: no checkpoint found")
        start_epoch = int(step) // (args.steps_per_epoch
                                    * args.grad_accum)
        print(f"resumed from {args.resume} step {step} "
              f"(epoch {start_epoch})")
    elif args.auto_resume:
        state, step = restore_checkpoint(ckpt_dir, state)
        if step is not None:
            start_epoch = int(step) // (args.steps_per_epoch
                                        * args.grad_accum)
            print(f"auto-resumed from step {step} (epoch {start_epoch})")
    if args.start_epoch is not None:
        start_epoch = args.start_epoch

    base_step = make_train_step(model, tcfg, mesh=mesh)
    if args.load_in_8bit or args.load_in_4bit:
        # QLoRA analog (reference train_ds.py:57-58 bitsandbytes load):
        # the frozen base lives int8/int4 IN-TREE in HBM — QDense reads
        # the quantized kernel + scale leaves directly (W8A8 forward
        # with the straight-through backward, nn/quant.int8_matmul; int4
        # dequantizes per-layer into the dot). No whole-tree float copy
        # ever materializes, so 7B/13B QLoRA fits a 16 GB chip — the
        # round-3 dequantize-inside-jit formulation held the full bf16
        # tree live across the step.
        from ..nn.quant import default_llm_predicate, quantize_dense_tree

        frozen = quantize_dense_tree(
            frozen, default_llm_predicate,
            bits=4 if args.load_in_4bit else 8)
        print(f"frozen base quantized in-tree "
              f"({'int4' if args.load_in_4bit else 'int8'})")
    # Donate the TrainState (arg 0): the step's updated params/moments
    # alias the previous buffers. Without this the old and new state
    # coexist at the step boundary — measured (XLA memory_analysis, r5)
    # as +4.16 GB at 13B / +3.29 GB at 7B, the margin that OOMed 13B
    # QLoRA on the 16 GB chip. The loop below only ever reads the
    # returned state, so donation is safe.
    step_fn = jax.jit(base_step, donate_argnums=(0,))
    logger = MetricsLogger(log_dir, use_wandb=args.use_wandb,
                           exp_name=args.exp_name)
    rng = jax.random.PRNGKey(args.seed)

    val_ds = AffDatasetVal(args.val_benchmark_dir) \
        if args.val_benchmark_dir else None
    best_iou = -1.0

    def run_validation(merged):
        """Reference validate() (train_ds.py:625-758) via the shared
        protocol in infer/evaluate.py. In QLoRA mode the frozen
        partition is quantized IN-TREE: the merged eval params carry
        int8/int4 kernels + scale leaves and QDense reads them directly
        (same path as int8 serving)."""
        from ..infer.evaluate import validate_on_benchmark

        iou, iocm, _ = validate_on_benchmark(
            model, {"params": merged}, tok, val_ds,
            val_batch_size=args.val_batch_size,
            model_max_length=args.model_max_length,
            conv_type=args.conv_type,
            use_mm_start_end=args.use_mm_start_end)
        return iou, iocm

    if args.eval_only:
        if val_ds is None or not len(val_ds):
            raise SystemExit("--eval_only needs --val_benchmark_dir")
        with mesh:
            val_iou, val_iocm = run_validation(
                merge_params(state.trainable, frozen))
        print(f"eval_only: val IoU {val_iou:.4f} IoCM {val_iocm:.4f}")
        logger.close()
        return

    # Preemption handling: TPU pods get SIGTERM'd with a grace window.
    # First signal -> finish the in-flight micro-step, checkpoint, exit 0
    # (auto-resume picks the run back up — the reference's DeepSpeed run
    # simply dies and loses the epoch). Second signal -> default action.
    import signal

    preempted = {"flag": False}

    def _on_term(signum, frame):
        preempted["flag"] = True
        signal.signal(signal.SIGTERM, signal.SIG_DFL)
        print("SIGTERM: checkpointing after the current step ...",
              flush=True)

    prev_term = signal.signal(signal.SIGTERM, _on_term)

    micro_per_epoch = args.steps_per_epoch * args.grad_accum
    # Async epoch/best-IoU checkpoints: training overlaps the writes;
    # only the preemption path flushes and saves synchronously.
    from .checkpoints import CheckpointWriter

    writer = CheckpointWriter(ckpt_dir)
    with mesh:
        for epoch in range(start_epoch, args.epochs):
            meters = {k: AverageMeter(k) for k in
                      ("loss", "ce_loss", "mask_bce_loss",
                       "mask_dice_loss", "taxonomy_ce_loss")}
            time_meter = AverageMeter("secs/batch")
            loader = PrefetchLoader(make_batch, micro_per_epoch,
                                    num_workers=args.workers)
            t0 = time.time()
            for i, raw in enumerate(loader):
                batch = TrainBatch(**{k: jnp.asarray(v)
                                      for k, v in raw.items()
                                      if k != "resizes"})
                batch = shard_batch_tree(mesh, batch)
                state, metrics = step_fn(state, frozen, batch, rng)
                if os.environ.get("HAFF_TEST_PREEMPT_STEP") == str(i):
                    os.kill(os.getpid(), signal.SIGTERM)  # test hook
                if preempted["flag"]:
                    # keep 2: this mid-training state AND the best-IoU
                    # checkpoint (max_to_keep=1 would garbage-collect
                    # the best weights, losing the run's real artifact)
                    writer.finish()
                    save_checkpoint(ckpt_dir, int(state.step), state,
                                    max_to_keep=2)
                    print(f"preemption checkpoint at step "
                          f"{int(state.step)}; exiting", flush=True)
                    logger.close()
                    signal.signal(signal.SIGTERM, prev_term)
                    return
                # Reference meter semantics (train_ds.py:556-620): every
                # micro-step updates the meters; each print_freq window
                # logs the windowed AVERAGE and resets.
                for k, m in meters.items():
                    m.update(float(metrics[k]))
                if (i + 1) % args.print_freq == 0:
                    time_meter.update((time.time() - t0)
                                      / args.print_freq)
                    t0 = time.time()
                    ProgressMeter(
                        micro_per_epoch,
                        list(meters.values()) + [time_meter],
                        prefix=f"Epoch {epoch} ").display(i + 1)
                    logger.log({k: m.avg for k, m in meters.items()},
                               int(state.step))
                    for m in meters.values():
                        m.reset()

            # --- validation (reference validate(), train_ds.py:625-758) ---
            if val_ds is not None and len(val_ds) and not args.no_eval:
                val_iou, val_iocm = run_validation(
                    merge_params(state.trainable, frozen))
                print(f"Epoch {epoch}: val IoU {val_iou:.4f} "
                      f"IoCM {val_iocm:.4f}")
                logger.log(dict(val_iou=val_iou, val_precision=val_iocm),
                           int(state.step))
                if val_iou > best_iou:
                    best_iou = val_iou
                    writer.save(int(state.step), state,
                                metrics=dict(iou=val_iou))
                    print(f"saved best checkpoint (IoU {val_iou:.4f})")
            else:
                writer.save(int(state.step), state)
    writer.finish()
    logger.close()


if __name__ == "__main__":
    main()
