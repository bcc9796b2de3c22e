"""Mechanical API-coverage audit vs the reference (GraphPKU/PygHO).

Walks every public top-level symbol of the reference package (by AST, no
torch import needed) plus the public methods/properties of its two core
tensor classes, and asserts each one is either

  * mapped to a pygho_tpu symbol that actually resolves, or
  * explicitly waived with a reason (tracked below, mirrored in
    docs/Migration.md and PARITY.md).

This keeps docs/Migration.md honest: if the reference snapshot grows a
symbol we haven't covered, or a mapped pygho_tpu symbol is renamed away,
this test fails.  Inventory source: SURVEY.md §2; map source:
docs/Migration.md.
"""

from __future__ import annotations

import ast
import dataclasses
import importlib
import pathlib

import pytest

REF = pathlib.Path("/root/reference/pygho")
pytestmark = pytest.mark.skipif(not REF.is_dir(),
                                reason="reference checkout not available")

# ---------------------------------------------------------------------------
# The coverage map: "RefModule.symbol" -> pygho_tpu dotted target, or a
# ("waived", reason) tuple.  Method-level entries use
# "RefModule.Class.method".
# ---------------------------------------------------------------------------

W = lambda reason: ("waived", reason)

MAP = {
    # ---- backend/SpTensor.py -------------------------------------------
    "SpTensor.indicehash": "pygho_tpu.backend.indexing:indicehash",
    "SpTensor.decodehash": "pygho_tpu.backend.indexing:decodehash",
    "SpTensor.indicehash_tight": "pygho_tpu.backend.indexing:indicehash_tight",
    "SpTensor.decodehash_tight": "pygho_tpu.backend.indexing:decodehash_tight",
    "SpTensor.coalesce": "pygho_tpu.backend.indexing:coalesce",
    "SpTensor.SparseTensor": "pygho_tpu:SparseTensor",
    "SpTensor.SparseTensor.is_coalesced": "pygho_tpu:SparseTensor.is_coalesced",
    "SpTensor.SparseTensor.to": W("JAX manages device placement (jax.device_put / loader device_put=True)"),
    "SpTensor.SparseTensor.indices": ("field", "pygho_tpu:SparseTensor.indices"),
    "SpTensor.SparseTensor.values": ("field", "pygho_tpu:SparseTensor.values"),
    "SpTensor.SparseTensor.sparse_dim": "pygho_tpu:SparseTensor.sparse_dim",
    "SpTensor.SparseTensor.nnz": ("field", "pygho_tpu:SparseTensor.nnz"),
    "SpTensor.SparseTensor.shape": "pygho_tpu:SparseTensor.shape",
    "SpTensor.SparseTensor.sparseshape": ("field", "pygho_tpu:SparseTensor.sparseshape"),
    "SpTensor.SparseTensor.denseshape": "pygho_tpu:SparseTensor.denseshape",
    "SpTensor.SparseTensor.diag": "pygho_tpu:SparseTensor.diag",
    "SpTensor.SparseTensor.sum": "pygho_tpu:SparseTensor.sum",
    "SpTensor.SparseTensor.max": "pygho_tpu:SparseTensor.max",
    "SpTensor.SparseTensor.mean": "pygho_tpu:SparseTensor.mean",
    "SpTensor.SparseTensor.unpooling": "pygho_tpu:SparseTensor.unpooling",
    "SpTensor.SparseTensor.unpooling_fromdense1dim":
        "pygho_tpu:SparseTensor.unpooling_fromdense1dim",
    "SpTensor.SparseTensor.from_torch_sparse_coo":
        "pygho_tpu:SparseTensor.from_scipy",  # torch-free converter
    "SpTensor.SparseTensor.to_torch_sparse_coo":
        "pygho_tpu:SparseTensor.to_scipy",
    "SpTensor.SparseTensor.tuplewiseapply": "pygho_tpu:SparseTensor.tuplewiseapply",
    "SpTensor.SparseTensor.diagonalapply": "pygho_tpu:SparseTensor.diagonalapply",
    "SpTensor.SparseTensor.add": "pygho_tpu:SparseTensor.add",
    "SpTensor.SparseTensor.catvalue": "pygho_tpu:SparseTensor.catvalue",
    # ---- backend/MaTensor.py -------------------------------------------
    "MaTensor.filterinf": "pygho_tpu.backend.matensor:filterinf",
    "MaTensor.MaskedTensor": "pygho_tpu:MaskedTensor",
    "MaTensor.MaskedTensor.fill_masked_":
        W("JAX arrays are immutable; pure fill_masked covers it"),
    "MaTensor.MaskedTensor.fill_masked": "pygho_tpu:MaskedTensor.fill_masked",
    "MaTensor.MaskedTensor.to": W("JAX manages device placement"),
    "MaTensor.MaskedTensor.padvalue":
        W("data is always explicitly masked (reference __init__ fill bug fixed, PARITY.md #9); no padvalue state"),
    "MaTensor.MaskedTensor.data": ("field", "pygho_tpu:MaskedTensor.data"),
    "MaTensor.MaskedTensor.mask": ("field", "pygho_tpu:MaskedTensor.mask"),
    "MaTensor.MaskedTensor.fullnegmask": "pygho_tpu:MaskedTensor.fullmask",
    "MaTensor.MaskedTensor.shape": "pygho_tpu:MaskedTensor.shape",
    "MaTensor.MaskedTensor.masked_dim": "pygho_tpu:MaskedTensor.masked_dim",
    "MaTensor.MaskedTensor.dense_dim": "pygho_tpu:MaskedTensor.dense_dim",
    "MaTensor.MaskedTensor.maskedshape": "pygho_tpu:MaskedTensor.maskedshape",
    "MaTensor.MaskedTensor.denseshape": "pygho_tpu:MaskedTensor.denseshape",
    "MaTensor.MaskedTensor.sum": "pygho_tpu:MaskedTensor.sum",
    "MaTensor.MaskedTensor.mean": "pygho_tpu:MaskedTensor.mean",
    "MaTensor.MaskedTensor.max": "pygho_tpu:MaskedTensor.max",
    "MaTensor.MaskedTensor.min": "pygho_tpu:MaskedTensor.min",
    "MaTensor.MaskedTensor.diag": "pygho_tpu:MaskedTensor.diag",
    "MaTensor.MaskedTensor.unpooling": "pygho_tpu:MaskedTensor.unpooling",
    "MaTensor.MaskedTensor.tuplewiseapply": "pygho_tpu:MaskedTensor.tuplewiseapply",
    "MaTensor.MaskedTensor.diagonalapply": "pygho_tpu:MaskedTensor.diagonalapply",
    "MaTensor.MaskedTensor.add": "pygho_tpu:MaskedTensor.add",
    "MaTensor.MaskedTensor.catvalue": "pygho_tpu:MaskedTensor.catvalue",
    # ---- backend matmuls / scatter --------------------------------------
    "Mamamm.mamamm": "pygho_tpu.backend:mamamm",
    "Spmamm.spmamm": "pygho_tpu.backend:spmamm",
    "Spmm.spmm": "pygho_tpu.backend:spmm",
    "Spspmm.ptr2batch": "pygho_tpu.backend.indexing:ptr2batch",
    "Spspmm.deg2batch": "pygho_tpu.backend.indexing:deg2batch",
    "Spspmm.spspmm_ind": "pygho_tpu.backend.indexing:spspmm_ind",
    "Spspmm.spsphadamard_ind": "pygho_tpu.backend.indexing:spsphadamard_ind",
    "Spspmm.filterind": "pygho_tpu.backend.indexing:filterind",
    "Spspmm.spsphadamard": "pygho_tpu.backend:spsphadamard",
    "Spspmm.spspmm": "pygho_tpu.backend:spspmm",
    "Spspmm.spspmpnn": "pygho_tpu.backend:spspmpnn",
    "utils.torch_scatter_reduce": "pygho_tpu.backend:segment_reduce",
    # ---- hodata ----------------------------------------------------------
    "MaData.MaHoData": W("PyG Data subclass; dense batches are built by hodata.collate_dense"),
    "MaData.to_dense_adj": "pygho_tpu.hodata.ma_data:to_dense_adj",
    "MaData.to_sparse_adj": "pygho_tpu.hodata.ma_data:to_sparse_adj",
    "MaData.to_dense_x": "pygho_tpu.hodata.ma_data:to_dense_x",
    "MaData.to_dense_tuplefeat": "pygho_tpu.hodata.ma_data:to_dense_tuplefeat",
    "MaData.batch2dense": "pygho_tpu.hodata:batch_to_dense_dict",
    "MaData.ma_datapreprocess": "pygho_tpu.hodata:ma_datapreprocess",
    "MaTupleSampler.spdsampler": "pygho_tpu.hodata:spdsampler",
    "MaTupleSampler.rdsampler": "pygho_tpu.hodata:rdsampler",
    "ParallelPreprocess.ParallelPreprocessDataset":
        "pygho_tpu.hodata:ParallelPreprocessDataset",
    "ParallelPreprocess.ParallelPreprocessDataset.processed_file_names":
        W("InMemoryDataset plumbing; our cache is content-addressed (hodata/preprocess.py)"),
    "ParallelPreprocess.ParallelPreprocessDataset.processed_dir":
        W("cache location is the content-addressed cache_path instance "
          "attribute (hodata/preprocess.py)"),
    "ParallelPreprocess.ParallelPreprocessDataset.process":
        W("PyG InMemoryDataset hook; preprocessing runs in __init__/ensure_processed"),
    "SpData.parseop": "pygho_tpu.hodata.sp_data:parseop",
    "SpData.parsekey": "pygho_tpu.hodata.sp_data:parsekey",
    "SpData.SpHoData": W("PyG Data subclass; explicit batcher hodata.collate_sparse implements the same __inc__ offset protocol"),
    "SpData.batch2sparse": "pygho_tpu.hodata:batch_to_sparse_dict",
    "SpData.sp_datapreprocess": "pygho_tpu.hodata:sp_datapreprocess",
    "SpTupleSampler.k_hop_subgraph": "pygho_tpu.hodata:k_hop_subgraph",
    "SpTupleSampler.KhopSampler": "pygho_tpu.hodata:KhopSampler",
    "SpTupleSampler.I2Sampler": "pygho_tpu.hodata:I2Sampler",
    "Wrapper.Sppretransform": "pygho_tpu.hodata:Sppretransform",
    "Wrapper.Mapretransform": "pygho_tpu.hodata:Mapretransform",
    "Wrapper.IterWrapper": W("loader internals (prefetch thread + device_put inside Sp/MaDataloader)"),
    "Wrapper.SpDataloader": "pygho_tpu.hodata:SpDataloader",
    "Wrapper.MaDataloader": "pygho_tpu.hodata:MaDataloader",
    # ---- honn ------------------------------------------------------------
    "Conv.NGNNConv": "pygho_tpu.honn.conv:NGNNConv",
    "Conv.SSWLConv": "pygho_tpu.honn.conv:SSWLConv",
    "Conv.I2Conv": "pygho_tpu.honn.conv:I2Conv",
    "Conv.DSSGNNConv": "pygho_tpu.honn.conv:DSSGNNConv",
    "Conv.PPGNConv": "pygho_tpu.honn.conv:PPGNConv",
    "Conv.GNNAKConv": "pygho_tpu.honn.conv:GNNAKConv",
    "Conv.SUNConv": "pygho_tpu.honn.conv:SUNConv",
    "SpOperator.KEYSEP": "pygho_tpu.honn.sp_operator:KEYSEP",
    "SpOperator.parse_precomputekey": "pygho_tpu.honn.sp_operator:parse_precomputekey",
    "utils.NormMomentumScheduler": "pygho_tpu.honn.utils:NormMomentumScheduler",
    "utils.NormMomentumScheduler.step":
        "pygho_tpu.honn.utils:NormMomentumScheduler.step",
    "utils.NoneNorm": "pygho_tpu.honn.utils:NoneNorm",
    "utils.BatchNorm": "pygho_tpu.honn.utils:BatchNorm",
    "utils.LayerNorm": "pygho_tpu.honn.utils:LayerNorm",
    "utils.MLP": "pygho_tpu.honn.utils:MLP",
}

# Operator families: identical class names in the mirrored modules; build
# the map entries programmatically instead of listing ~50 rows.
_OPERATOR_MODULES = {
    "SpOperator": "pygho_tpu.honn.sp_operator",
    "MaOperator": "pygho_tpu.honn.ma_operator",
    "TensorOp": "pygho_tpu.honn.tensorop",
}


def _ref_public_symbols():
    """(qualified_name, kind) for every public reference symbol."""
    out = []
    for path in sorted(REF.rglob("*.py")):
        modname = path.stem
        if modname == "__init__":
            continue
        tree = ast.parse(path.read_text())
        for node in tree.body:
            if isinstance(node, ast.ClassDef) and not node.name.startswith("_"):
                out.append((f"{modname}.{node.name}", "class"))
                for sub in node.body:
                    if isinstance(sub, ast.FunctionDef) and \
                            not sub.name.startswith("_") and sub.name != "forward":
                        out.append((f"{modname}.{node.name}.{sub.name}", "method"))
            elif isinstance(node, ast.FunctionDef) and not node.name.startswith("_"):
                out.append((f"{modname}.{node.name}", "function"))
            elif isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name) and t.id.isupper():
                        out.append((f"{modname}.{t.id}", "const"))
    return out


def _resolve(target: str):
    """Resolve 'module:attr.subattr' to an object; raises if missing."""
    modname, _, attrpath = target.partition(":")
    obj = importlib.import_module(modname)
    for part in attrpath.split("."):
        if dataclasses.is_dataclass(obj) and isinstance(obj, type) and \
                part in {f.name for f in dataclasses.fields(obj)}:
            return ("dataclass-field", part)
        obj = getattr(obj, part)
    return obj


def _lookup(qualname: str):
    """Return the MAP entry for a reference symbol, handling the
    mirrored-operator-module families."""
    if qualname in MAP:
        return MAP[qualname]
    mod, _, rest = qualname.partition(".")
    if mod in _OPERATOR_MODULES and rest and "." not in rest:
        return f"{_OPERATOR_MODULES[mod]}:{rest}"
    return None


def test_every_reference_symbol_is_covered():
    missing = []
    for qualname, kind in _ref_public_symbols():
        if _lookup(qualname) is None:
            missing.append(f"{qualname} ({kind})")
    assert not missing, (
        "reference public symbols with no Migration.md mapping or waiver:\n  "
        + "\n  ".join(missing))


def test_every_mapped_target_resolves():
    broken = []
    seen_targets = set()
    for qualname, _ in _ref_public_symbols():
        entry = _lookup(qualname)
        if entry is None or (isinstance(entry, tuple) and entry[0] == "waived"):
            continue
        if isinstance(entry, tuple) and entry[0] == "field":
            entry = entry[1]
        if entry in seen_targets:
            continue
        seen_targets.add(entry)
        try:
            _resolve(entry)
        except Exception as exc:  # noqa: BLE001 - collect every breakage
            broken.append(f"{qualname} -> {entry}: {exc!r}")
    assert not broken, (
        "mapped pygho_tpu targets that do not resolve:\n  " + "\n  ".join(broken))


def test_dataclass_fields_exist():
    """Entries declared as pytree fields really are dataclass fields."""
    import pygho_tpu

    sp_fields = {f.name for f in dataclasses.fields(pygho_tpu.SparseTensor)}
    ma_fields = {f.name for f in dataclasses.fields(pygho_tpu.MaskedTensor)}
    for qualname, entry in MAP.items():
        if not (isinstance(entry, tuple) and entry[0] == "field"):
            continue
        attr = entry[1].rsplit(".", 1)[-1]
        fields = sp_fields if "SparseTensor" in entry[1] else ma_fields
        if attr in fields:
            continue
        # accept a property of the class as well (e.g. derived accessors)
        cls = pygho_tpu.SparseTensor if "SparseTensor" in entry[1] \
            else pygho_tpu.MaskedTensor
        assert hasattr(cls, attr), f"{qualname}: {entry[1]} is neither field nor property"
