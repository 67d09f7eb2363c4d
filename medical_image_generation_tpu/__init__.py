"""medimgen-tpu: TPU-native framework for hyperparameter-free 2D/3D medical image generation.

A from-scratch JAX/XLA/Pallas/pjit re-design with the capabilities of
VKostoulas/Medical_Image_Generation (see /root/repo/SURVEY.md for the structural
analysis of the reference). Nothing in here is a port of the reference's PyTorch
code; components cite the reference behavior they reproduce as `file:line` in
docstrings so capability parity can be checked.
"""

__version__ = "0.1.0"
