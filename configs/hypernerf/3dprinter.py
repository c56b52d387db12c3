# HyperNeRF '3dprinter' — mirrors arguments/hypernerf/3dprinter.py (time-plane reso 100).
_base_ = "default.py"
ModelHiddenParams = dict(
    kplanes_config=dict(
        grid_dimensions=2,
        input_coordinate_dim=4,
        output_coordinate_dim=16,
        resolution=[64, 64, 64, 100],
    ),
)
