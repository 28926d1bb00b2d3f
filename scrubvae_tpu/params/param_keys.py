"""Config schema: the reference's 4-section key set
(/root/reference/src/scrubvae/params/param_keys.py:1-34) plus keys the
reference reads but never declared (l2_reg, n_iter - see SURVEY.md 3.6) and
TPU-specific additions under ``train`` (precision, mesh).
"""

PARAM_KEYS = dict(
    data=[
        "arena_size",
        "batch_size",
        "data_path",
        "dataset",
        "direction_process",
        "encoder_direction_process",  # aligned encoder view (TPU addition)
        "host_stream",  # host-RAM frame store + slab prefetch (TPU addition)
        # documented-deviation gates (PARITY.md): opt-in intended semantics
        # for two reference preprocessing quirks found by the composition
        # differential (tests/test_preprocess_composition.py)
        "exact_offsets",  # un-truncated scaled offsets (ref: int-truncated)
        "part_centered_speed",  # true part-root speed centering (ref: no-op)
        "normalize",
        "remove_speed_outliers",
        "stride",
        "window",
    ],
    disentangle=[
        "alpha",
        "balance_loss",
        "bandwidth",
        "features",
        "method",
        "polynomial",
        "var_mode",
        # read by the reference without being in its schema (get/model.py:83,
        # trainer.py:144) - declared here so configs can't crash on them:
        "l2_reg",
        "n_iter",
        # documented-deviation gates (PARITY.md): live adversarial inner fit
        # (the reference's is dead code) and the reference's in-loop GR
        # ensemble-loss division (geometric head down-weighting):
        "adv_fit",
        "gr_legacy_norm",
    ],
    model=[
        "activation",
        "channel",
        "diag",
        "init_dilation",
        "kernel",
        "load_model",
        "prior",
        "start_epoch",
        "type",
        "window",
        "z_dim",
        "sigma_head_rank",  # low-rank fc_sigma factorization (TPU addition)
        "packed_sigma",  # packed-tril Cholesky head; None = auto (TPU addition)
        # MLP/transformer variants:
        "hidden",
        "n_heads",
        "ff_size",
        "n_layers",
    ],
    train=[
        "beta_anneal",
        "lr",
        "num_epochs",
        "optimizer",
        "lr_schedule",
        "minimal_test",
        # TPU-native additions:
        "precision",  # "bf16" | "f32" compute for the conv/matmul path
        "mesh",  # e.g. {"data": -1}; None = all devices on the data axis
        "seed",
        "donate",  # donate state buffers in the jitted step
        "moment_dtype",  # "bf16" (default) | "f32" Adam first moment
        "param_dtype",  # "bf16" storage for large kernels (SR stores)
        "fused_optimizer",  # Pallas fused AdamW (default on)
        "clip_norm",  # grad-clip max norm; 0 disables; None = 1e6 parity
        "scan_epoch",  # device-resident batch loop (default on)
        "eval_start_epoch",  # first epoch for val metrics (reference: 50)
        "halt_on_nonfinite",  # divergence tripwire (default on)
    ],
)
