# D-NeRF 'lego' — mirrors arguments/dnerf/lego.py (time-plane reso 25, out-dim 32).
_base_ = "dnerf_default.py"
ModelHiddenParams = dict(
    kplanes_config=dict(
        grid_dimensions=2,
        input_coordinate_dim=4,
        output_coordinate_dim=32,
        resolution=[64, 64, 64, 25],
    ),
)
