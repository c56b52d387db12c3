# Neu3D sear_steak — mirrors arguments/neu3d/sear_steak.py.
_base_ = "default.py"
OptimizationParams = dict(
    batch_size=2,
)
