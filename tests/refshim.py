"""Import and run the ACTUAL reference code (`/root/reference`) on CPU.

The reference cannot normally be imported here: `custom_sparse_ops.py:8`
JIT-builds a CUDA extension at import time, `preprocess.py:8-9` imports
`ogb`/`torch_geometric` (not installed), and the training path calls
`torch.cuda.*` throughout.  This shim makes the real modules runnable on
CPU torch without editing a single reference line:

* ``load_reference()`` patches ``torch.utils.cpp_extension.load`` to
  return a CPU stub of the `spmm` extension whose three entry points
  reproduce the CUDA kernels' semantics (`spmm_cpp/spmm.cpp:52-56`,
  `cuda_spmm.cu:787-827`).  The authors' own validation stand-in for the
  CUDA spmm is a plain matmul (`custom_sparse_ops.py:24-26`), which is
  exactly what the stub uses.
* ``cpu_cuda_shim()`` is a context manager that maps the CUDA-only calls
  the reference makes (`torch.cuda.set_device/synchronize/FloatTensor/
  max_memory_reserved`, `.to(<int device>)`, `torch.ones(device=...)`)
  onto CPU equivalents, so `main.train` (`main.py:68-241`) runs a real
  single-rank epoch loop unmodified.

Used by tests/test_reference_code_parity.py to prove per-layer and
end-to-end parity of gnn_tpu against the reference's OWN code, not a
reimplementation of it.
"""
from __future__ import annotations

import contextlib
import os
import sys
import types

import torch

REFERENCE_DIR = "/root/reference"

_cache: dict[str, types.ModuleType] = {}


# ---------------------------------------------------------------------------
# CPU stub of the `spmm` CUDA extension
# ---------------------------------------------------------------------------

def _spmm_dense(sparse: torch.Tensor, dense: torch.Tensor) -> torch.Tensor:
    """CPU stand-in for `spmm_load_balance`/`spmm_naive`
    (`spmm_cpp/spmm.cpp:23-42`): sparse COO x dense -> dense."""
    return torch.sparse.mm(sparse, dense)


def _create_coo_tensor(fullrowptr, rowptr, colidx, normfact, nrows, ncols):
    """CPU reimplementation of `to_coo_tensor` (`cuda_spmm.cu:806-827`):
    expand rowptr into row indices and recompute edge values as
    ``1/deg_full(row) * normfact[col]`` (`cuda_spmm.cu:800`)."""
    rp = rowptr.long()
    counts = rp[1:] - rp[:-1]
    rows = torch.repeat_interleave(
        torch.arange(int(nrows), dtype=torch.long), counts)
    cols = colidx.long()  # int16 on the wire (`sampler.py:136`)
    full_deg = (fullrowptr[1:] - fullrowptr[:-1]).float()
    value = (1.0 / full_deg[rows]) * normfact[cols]
    indices = torch.stack([rows, cols])
    return torch.sparse_coo_tensor(
        indices, value, (int(nrows), int(ncols))).coalesce()


def make_spmm_stub() -> types.SimpleNamespace:
    return types.SimpleNamespace(
        spmm_load_balance=_spmm_dense,
        spmm_naive=_spmm_dense,
        create_coo_tensor=_create_coo_tensor,
    )


# ---------------------------------------------------------------------------
# Module stubs for reference imports not installed here
# ---------------------------------------------------------------------------

def _install_import_stubs() -> None:
    if "ogb" not in sys.modules:
        ogb = types.ModuleType("ogb")
        npp = types.ModuleType("ogb.nodeproppred")

        class _Unavailable:  # pragma: no cover - never constructed
            def __init__(self, *a, **k):
                raise RuntimeError("ogb is not installed in this env")

        npp.PygNodePropPredDataset = _Unavailable
        ogb.nodeproppred = npp
        sys.modules["ogb"] = ogb
        sys.modules["ogb.nodeproppred"] = npp
    if "torch_geometric" not in sys.modules:
        tg = types.ModuleType("torch_geometric")
        tgu = types.ModuleType("torch_geometric.utils")
        tgu.to_undirected = None
        tgu.dropout_adj = None
        tg.utils = tgu
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.utils"] = tgu


# ---------------------------------------------------------------------------
# Reference import
# ---------------------------------------------------------------------------

def load_reference() -> types.SimpleNamespace:
    """Import the real reference modules (utils, models, sampler,
    preprocess, custom_sparse_ops, main) with the spmm extension stubbed.
    Idempotent; the modules are cached for the pytest session."""
    if _cache:
        return types.SimpleNamespace(**_cache)

    os.environ.setdefault("MPLBACKEND", "Agg")  # utils.py imports pyplot
    _install_import_stubs()

    import torch.utils.cpp_extension as cppext

    orig_load = cppext.load

    def _fake_load(name=None, *a, **k):
        if name == "spmm":
            return make_spmm_stub()
        return orig_load(name, *a, **k)  # pragma: no cover

    cppext.load = _fake_load
    sys.path.insert(0, REFERENCE_DIR)
    # main.py parses sys.argv at module scope (`main.py:24-65`)
    orig_argv = sys.argv
    sys.argv = ["main.py"]
    try:
        import custom_sparse_ops  # noqa: F401
        import models  # noqa: F401
        import preprocess  # noqa: F401
        import sampler  # noqa: F401
        import utils  # noqa: F401
        import main  # noqa: F401
        for m in (custom_sparse_ops, models, preprocess, sampler, utils,
                  main):
            assert m.__file__.startswith(REFERENCE_DIR), m.__file__
            _cache[m.__name__] = m
    finally:
        sys.argv = orig_argv
        cppext.load = orig_load
        sys.path.remove(REFERENCE_DIR)
    return types.SimpleNamespace(**_cache)


# ---------------------------------------------------------------------------
# CPU shim for the reference's torch.cuda usage
# ---------------------------------------------------------------------------

def _is_cuda_target(x) -> bool:
    if isinstance(x, int) and not isinstance(x, bool):
        return True  # `--cuda '0'` style integer device ids (`main.py:250`)
    if isinstance(x, torch.device):
        return x.type == "cuda"
    if isinstance(x, str):
        return x.startswith("cuda") or x.isdigit()
    return False


@contextlib.contextmanager
def cpu_cuda_shim():
    """Remap the reference's CUDA calls onto CPU for the duration of a
    test: covers every torch.cuda use on `main.train`'s single-rank path
    (`main.py:75,126-137,179-199`), `.to(device)` with integer device ids
    (`sampler.py:114,135-139`), and `torch.ones(device=...)` in the loss
    (`utils.py:133`)."""
    orig_to = torch.Tensor.to
    orig_module_to = torch.nn.Module.to
    orig_ones = torch.ones
    orig_torch_load = torch.load
    patched_cuda = {
        "set_device": torch.cuda.set_device,
        "synchronize": torch.cuda.synchronize,
        "max_memory_reserved": torch.cuda.max_memory_reserved,
    }
    had_float_tensor = hasattr(torch.cuda, "FloatTensor")
    orig_float_tensor = getattr(torch.cuda, "FloatTensor", None)

    def _to(self, *args, **kwargs):
        if args and _is_cuda_target(args[0]):
            args = ("cpu",) + args[1:]
        if _is_cuda_target(kwargs.get("device")):
            kwargs = dict(kwargs, device="cpu")
        return orig_to(self, *args, **kwargs)

    def _module_to(self, *args, **kwargs):
        if args and _is_cuda_target(args[0]):
            args = ("cpu",) + args[1:]
        if _is_cuda_target(kwargs.get("device")):
            kwargs = dict(kwargs, device="cpu")
        return orig_module_to(self, *args, **kwargs)

    def _ones(*args, **kwargs):
        if _is_cuda_target(kwargs.get("device")):
            kwargs = dict(kwargs, device="cpu")
        return orig_ones(*args, **kwargs)

    def _load(*args, **kwargs):
        # torch >= 2.6 flipped weights_only's default to True; the
        # reference's whole-module save/load (`main.py:199,218`) predates
        # that and needs the old semantics
        kwargs.setdefault("weights_only", False)
        return orig_torch_load(*args, **kwargs)

    torch.Tensor.to = _to
    torch.nn.Module.to = _module_to
    torch.ones = _ones
    torch.load = _load
    torch.cuda.set_device = lambda *a, **k: None
    torch.cuda.synchronize = lambda *a, **k: None
    torch.cuda.max_memory_reserved = lambda *a, **k: 0
    torch.cuda.FloatTensor = (
        lambda *shape: torch.empty(*shape, dtype=torch.float32))
    try:
        yield
    finally:
        torch.Tensor.to = orig_to
        torch.nn.Module.to = orig_module_to
        torch.ones = orig_ones
        torch.load = orig_torch_load
        for k, v in patched_cuda.items():
            setattr(torch.cuda, k, v)
        if had_float_tensor:
            torch.cuda.FloatTensor = orig_float_tensor
        else:  # pragma: no cover
            del torch.cuda.FloatTensor
