# Neu3D flame_steak — mirrors arguments/neu3d/flame_steak.py.
_base_ = "default.py"
OptimizationParams = dict(
    batch_size=2,
)
