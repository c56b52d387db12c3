# Neu3D coffee_martini — mirrors arguments/neu3d/coffee_martini.py (defaults, batch 4).
_base_ = "default.py"
