# Neu3D cook_spinach — mirrors arguments/neu3d/cook_spinach.py.
_base_ = "default.py"
OptimizationParams = dict(
    batch_size=2,
)
