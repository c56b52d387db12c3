# Neu3D cut_roasted_beef — mirrors arguments/neu3d/cut_roasted_beef.py.
_base_ = "default.py"
OptimizationParams = dict(
    batch_size=2,
)
