# HyperNeRF 'banana' — mirrors arguments/hypernerf/banana.py (time-plane reso 250).
_base_ = "default.py"
ModelHiddenParams = dict(
    kplanes_config=dict(
        grid_dimensions=2,
        input_coordinate_dim=4,
        output_coordinate_dim=16,
        resolution=[64, 64, 64, 250],
    ),
)
