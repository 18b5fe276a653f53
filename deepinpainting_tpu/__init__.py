"""deepinpainting_tpu — TPU-native reference-guided image inpainting.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Image-Processing-Systems-Laboratory/DeepInPainting (see SURVEY.md).
"""

from .config import Config

__version__ = "0.1.0"
