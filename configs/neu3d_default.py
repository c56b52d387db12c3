# Neu3D/DyNeRF default overlay (mirrors arguments/neu3d/default.py semantics)
ModelHiddenParams = dict(
    kplanes_config=dict(
        grid_dimensions=2,
        input_coordinate_dim=4,
        output_coordinate_dim=16,
        resolution=[64, 64, 64, 150],
    ),
    multires=[1, 2],
    defor_depth=1,
    net_width=128,
)
OptimizationParams = dict(
    dataloader=True,
    batch_size=4,
    coarse_base_iterations=3000,
    coarse_lang_iterations=1000,
    fine_base_iterations=10000,
    fine_lang_iterations=10000,
)
