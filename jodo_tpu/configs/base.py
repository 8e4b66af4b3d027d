"""Config system: ml_collections ConfigDicts, CLI-overridable leaf-by-leaf.

Same schema as the reference configs (configs/vpsde_qm9_uncond_jodo.py:7-119)
plus TPU-specific knobs under `config.tpu` (padding, dtype policy, mesh).
All eight reference experiment configs are reproduced in this package; the
reference's eval()-based dynamic dispatch for collate/layers is replaced by
plain names resolved through registries.
"""

import ml_collections


def base_config() -> ml_collections.ConfigDict:
    config = ml_collections.ConfigDict()

    config.exp_type = "vpsde_edge"
    config.pred_edge = True
    config.only_2D = False

    # data
    config.data = data = ml_collections.ConfigDict()
    data.root = "data/QM9"
    data.name = "QM9"
    data.processed_file = ""
    data.transform = "EdgeCom"
    data.info_name = "qm9_with_h"
    data.num_workers = 0

    data.compress_edge = True
    data.centered = True
    data.include_aromatic = False
    data.atom_types = 5
    data.bond_types = 4
    data.fc_scale = [-1.0, 1.0]
    data.max_node = 29
    # opt-in: train/eval on a synthetic dataset when raw files are absent
    # (tests/benchmarks/smoke runs). Off by default: missing data raises.
    data.allow_synthetic = False
    data.synthetic_size = 512  # molecules in the synthetic fallback set
    # 'chemical' = valence-exact, 3D-stable-by-construction molecules
    # (data/synthetic.py); 'random' = cheap random graphs
    data.synthetic_kind = "chemical"
    # int8-coded batches expanded on device (decode_compact_batch): ~9x
    # less host->device traffic + cheaper host collate; exactness-tested
    data.compact_batches = True

    # SDE
    config.sde = sde = ml_collections.ConfigDict()
    sde.schedule = "cosine"
    sde.continuous_beta_0 = 0.1
    sde.continuous_beta_1 = 20.0

    # model
    config.model = model = ml_collections.ConfigDict()
    model.name = "DGT"
    model.pred_data = True
    model.include_fc_charge = True
    model.normalize_factors = "1, 4, 4, 1"
    model.ema_decay = 0.999
    model.edge_ch = 2
    model.nf = 256
    model.n_layers = 8
    model.n_heads = 16
    model.dropout = 0.1
    model.cond_time = True
    model.dist_gbf = True
    model.gbf_name = "CondGaussianLayer"
    model.self_cond = True
    model.self_cond_type = "ori"

    model.edge_quan_th = 0.0
    model.n_extra_heads = 2
    model.CoM = True
    model.mlp_ratio = 2
    model.spatial_cut_off = 2.0
    model.softmax_inf = True
    model.trans_name = "TransMixLayer"
    model.time_dim = 0  # 0 => nf * 4
    model.rw_depth = 8
    model.cond_ch = 1

    model.loss_weights = "1., 0.25, 0.1"
    model.noise_align = True

    # training
    config.training = training = ml_collections.ConfigDict()
    training.reduce_mean = False
    training.batch_size = 128
    training.eval_batch_size = 128
    training.eval_samples = 128
    training.log_freq = 500
    training.n_iters = 1500000
    training.snapshot_freq = 50000
    training.snapshot_freq_for_preemption = 10000
    training.snapshot_sampling = True
    # steps chained inside one XLA dispatch (lax.scan): amortises per-step
    # host->device dispatch latency ~K-fold (critical over tunneled TPU
    # links, where one dispatch of the full train-state pytree costs
    # ~450 ms; BASELINE.md r3). 1 = reference-style one dispatch per step.
    training.steps_per_dispatch = 32
    # train-side pad ladder (CSV of pads; "" = flat dataset-max padding).
    # Each multi-step dispatch chunk draws same-size-bucket batches and
    # compiles at that pad (see data.loader.BucketedLoader).
    training.bucket_pads = ""
    # per-bucket batch-size scale cap: buckets with pad p draw batches of
    # base_batch * min(cap, (pad_max/p)^2) molecules (rounded to 8). The
    # base batch is sized for the worst pad; 1.0 = off (uniform batch).
    # Stratum sampling stays population-proportional, so gradients remain
    # unbiased — larger small-pad batches only cut their variance.
    training.bucket_batch_scale = 1.0
    # wall-clock training budget in seconds, measured from the end of
    # compile warmup (0 = off). The loop exits cleanly at the first chunk
    # boundary past the budget (meta checkpoint still written), so runs
    # can be bounded by TIME instead of steps — preemptible-quota
    # scheduling and equal-wall-clock A/Bs both need it.
    training.max_train_wall_s = 0.0

    # optimization
    config.optim = optim = ml_collections.ConfigDict()
    optim.weight_decay = 0.0
    optim.optimizer = "AdamW"
    optim.lr = 2e-4
    optim.beta1 = 0.9
    optim.eps = 1e-8
    optim.warmup = 100000
    optim.grad_clip = 10.0
    optim.disable_grad_log = True

    # sampling
    config.sampling = sampling = ml_collections.ConfigDict()
    sampling.method = "ancestral"
    sampling.steps = 1000
    sampling.vis_row = 4
    sampling.vis_col = 4
    sampling.dpm_solver_method = "singlestep_fixed"
    sampling.dpm_solver_order = 2

    # evaluation
    config.eval = evaluate = ml_collections.ConfigDict()
    evaluate.enable_sampling = True
    evaluate.batch_size = 2500
    evaluate.num_samples = 10000
    evaluate.begin_ckpt = 30
    evaluate.end_ckpt = 30
    evaluate.ckpts = ""
    evaluate.save_graph = False
    evaluate.sub_geometry = True
    evaluate.reference_ckpt = ""  # path to a reference .pth to score directly
    # auto-train steps for the conditional-eval EGNN property classifier
    # when no pretrained checkpoint is configured (VERDICT r1 weak #8)
    evaluate.classifier_train_steps = 2000

    # TPU-specific
    config.tpu = tpu = ml_collections.ConfigDict()
    tpu.pad_nodes = 0  # 0 => round data.max_node up to a multiple of 8
    tpu.compute_dtype = "bfloat16"  # production default; f32 via --config.tpu.compute_dtype
    tpu.use_pallas = False  # fused edge-attention kernel (TPU; interpret on CPU)
    # sampling-path auto choice: per round pad, pick the measured-fastest
    # attention path (XLA at pads <= 16, fused Pallas kernel above; see
    # BASELINE.md r4 per-bucket table). Overrides use_pallas/_block during
    # generation only; training always takes the XLA autodiff path.
    tpu.pallas_auto = True
    tpu.use_pallas_equi = False  # fused equi-gate kernel (currently slower; see BASELINE.md)
    tpu.fold_equi_ln = False  # algebraic LN fold: exact but measured slower (BASELINE.md r5)
    tpu.use_pallas_edge_chain = False  # fused post-attention edge+equi chain kernel
    tpu.use_pallas_block = False  # fully-fused per-layer pair chain (ops/pallas_dgt)
    # recompute attention in bwd. r3 value-fetch timings: OFF is faster at
    # QM9 scale (64.6 vs 76.8 ms/iter bf16); keep ON for GEOM-scale pair
    # tensors (memory). r2's opposite conclusion was an enqueue-rate
    # measurement artifact (BASELINE.md r3).
    tpu.remat_attn = False
    tpu.remat_ffn = False  # recompute edge FFN + dropout masks in bwd
    tpu.mesh_shape = ""  # e.g. '8' or '4,2' ; '' => all local devices, 1-D data mesh
    tpu.donate_state = True
    # training-loop PRNG implementation: 'rbg' generates dropout masks via
    # the hardware RNG (threefry costs real step time at the flagship's
    # ~270M bernoulli draws/step with dropout 0.1); set 'threefry2x32'
    # for the partitionable default
    tpu.train_prng_impl = "rbg"

    config.seed = 42
    return config


def pad_nodes(config) -> int:
    """Static per-dataset node padding (multiple of 8 sublanes)."""
    if config.tpu.pad_nodes:
        return int(config.tpu.pad_nodes)
    n = int(config.data.max_node)
    return ((n + 7) // 8) * 8
