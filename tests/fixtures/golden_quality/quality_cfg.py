
capacity_granule = 4096
tile_capacity = 256
# plane_reg: the time-axis regularizers every reference preset configures
# (dead upstream behind the `stage == "fine"` guard, train.py:331). With 4
# train frames over 8 time cells, an unregularized time axis lets the
# optimizer collapse the moving object inside a sparsely-supervised cell
# (observed: one train view at 21.6 dB vs 38 dB siblings, flat across the
# whole cell). Smoothing ties neighboring cells together.
plane_reg = True
ModelHiddenParams = dict(
    kplanes_out_dim=8, kplanes_resolution=[32, 32, 32, 8], multires=[1, 2],
    net_width=64, defor_depth=1, no_do=False, no_ds=False,
    time_smoothness_weight=0.01, l1_time_planes=0.0001,
    plane_tv_weight=0.0001,
)
OptimizationParams = dict(
    coarse_base_iterations=1200, coarse_lang_iterations=300,
    fine_base_iterations=1500, fine_lang_iterations=1200,
    densify_from_iter=300,
    densify_until_iter=2000,
    densification_interval=200,
    pruning_from_iter=99999,
    opacity_reset_interval=99999, max_points=20000, batch_size=1,
)

