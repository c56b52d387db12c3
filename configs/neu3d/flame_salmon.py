# Neu3D flame_salmon — mirrors arguments/neu3d/flame_salmon.py (defaults, batch 4).
_base_ = "default.py"
