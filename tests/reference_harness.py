"""Import the read-only reference with CUDA stubbed out, for parity tests.

The reference hardcodes CUDA everywhere (pervasive `.cuda()` calls and the
missing-parentheses `torch.cuda.is_available` truthiness — SURVEY.md §2.4).
The baked-in torch is CPU-only, so we monkeypatch the handful of CUDA entry
points to CPU equivalents before importing.  Nothing is copied; the reference
stays read-only at /root/reference.
"""

import sys

import torch

_PATCHED = False


def load_reference():
    """Patch torch CUDA surface and put /root/reference on sys.path."""
    global _PATCHED
    if _PATCHED:
        return
    torch.cuda.FloatTensor = torch.FloatTensor
    torch.cuda.LongTensor = torch.LongTensor
    torch.cuda.ByteTensor = torch.ByteTensor
    torch.cuda.BoolTensor = torch.BoolTensor
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    _PATCHED = True


class FakeCtx:
    """Minimal stand-in for torch.autograd function ctx (forward-only use)."""
    pass
