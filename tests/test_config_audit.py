"""Config-surface parity audit (reference `gluefactory/configs/*.yaml`).

For every reference YAML, every (dotted) key must either exist in the
same-stem repo YAML or appear in the deliberate-divergence allowlist below
with a documented reason — so config drift can never accumulate silently
(VERDICT r2, weak #5 / next #6). Values are free to differ (renamed module
paths, gated backends); the audit is about the KEY surface users write.
"""

from fnmatch import fnmatch
from pathlib import Path

import pytest

yaml = pytest.importorskip("yaml")

REF_DIR = Path("/root/reference/gluefactory/configs")
REPO_DIR = Path(__file__).parent.parent / "gluefactory_tpu" / "configs"

# reference dotted-key glob -> reason for the deliberate divergence.
# Every entry must keep matching at least one reference key (staleness check).
ALLOW = {
    # --- schedules -------------------------------------------------------
    "train.lr_schedule.on_epoch": (
        "boolean in the reference (epoch- vs iteration-stepping); our "
        "schedules are epoch-based by default with `unit: iter` as the "
        "iteration mode (train.py `_apply_one_schedule`)"
    ),
    "train.lr_schedule.gamma": (
        "parameter of the reference's multi_step alternative (type is `exp` "
        "in every shipped config); covered by our factor/on_epoch schedule"
    ),
    "train.lr_schedule.step": "see train.lr_schedule.gamma",
    "train.lr_schedule.n_steps": "see train.lr_schedule.gamma",
    # --- train misc ------------------------------------------------------
    "train.submodules": (
        "reference snapshots extra module source dirs into the experiment; "
        "our trainer snapshots the whole gluefactory_tpu package"
    ),
    # --- vestigial pipeline slots ---------------------------------------
    "model.detector.name": (
        "not a TwoViewPipeline component in the reference either "
        "(two_view_pipeline.py:36-42); vestigial key OmegaConf carries"
    ),
    "model.descriptor.name": "see model.detector.name",
    # --- weights / backends ----------------------------------------------
    "model.matcher.features": (
        "selects the official pretrained flavor in the pip lightglue "
        "package; here the flavor is the converted-weights path "
        "(`model.matcher.weights`, compat/torch_conversion.py)"
    ),
    "model.extractor.detector": (
        "sift+NN legacy key for the pycolmap_cuda backend; our key is "
        "`backend` with opencv/jax backends (pycolmap is gated)"
    ),
    "model.extractor.pycolmap_options.*": "pycolmap backend is gated here",
    "data.load_features.padding_fn": (
        "CacheLoader pads built-in (models/cache_loader.py pad path); the "
        "reference passes a pad fn by name"
    ),
    # --- benchmark preprocessing normalization ---------------------------
    "benchmarks.*.data": (
        "reference sets `data: null` then a sibling `preprocessing:` "
        "section; normalized here to `benchmarks.<b>.data.preprocessing.*`"
    ),
    "benchmarks.*.preprocessing.*": "see benchmarks.*.data",
    "benchmarks.megadepth1500.data.preprocessing": (
        "aliked/disk NN configs null the nested preprocessing then set "
        "side/resize at the data level; normalized to data.preprocessing.*"
    ),
    "benchmarks.megadepth1500.data.side": (
        "normalized to benchmarks.megadepth1500.data.preprocessing.side"
    ),
    "benchmarks.megadepth1500.data.resize": (
        "normalized to benchmarks.megadepth1500.data.preprocessing.resize"
    ),
    # --- wireframe extractor conf shape ----------------------------------
    "model.extractor.line_extractor.name": (
        "line detector is the built-in LSD host backend "
        "(models/lines/wireframe.py); reference passes a dotted model path"
    ),
    "model.extractor.line_extractor.max_num_lines": (
        "flattened to `model.extractor.max_num_lines`"
    ),
    "model.extractor.line_extractor.min_length": (
        "flattened to `model.extractor.min_length`"
    ),
    "model.extractor.line_extractor.force_num_lines": (
        "line sets are universally padded+masked here (CLAUDE.md "
        "conventions), i.e. force_num_lines is always-on semantics"
    ),
    "model.extractor.line_extractor.trainable": "LSD backend has no params",
    "model.extractor.wireframe_params.nms_radius": (
        "flattened to `model.extractor.nms_radius`"
    ),
    "model.extractor.wireframe_params.merge_points": (
        "junction merging is always on (DBSCAN-exact union-find, "
        "models/lines/wireframe.py)"
    ),
    "model.extractor.wireframe_params.merge_line_endpoints": (
        "see model.extractor.wireframe_params.merge_points"
    ),
    # --- gluestick -------------------------------------------------------
    "model.matcher.GNN_layers": (
        "the 18-entry self/cross list is represented as `n_layers: 9` "
        "(pairs of self+line, cross) in our gluestick conf"
    ),
    # --- eth3d benchmark nesting -----------------------------------------
    "benchmarks.eth3d.ground_truth.*": (
        "nested under `benchmarks.eth3d.model.ground_truth` here (the "
        "ground_truth is a pipeline component)"
    ),
}


def _flatten(d, pre=""):
    out = {}
    if isinstance(d, dict) and d:
        for k, v in d.items():
            out.update(_flatten(v, f"{pre}{k}."))
    else:
        out[pre[:-1]] = d
    return out


def _allowed(key):
    return any(fnmatch(key, pat) for pat in ALLOW)


@pytest.mark.parametrize(
    "name", sorted(p.name for p in REF_DIR.glob("*.yaml")) if REF_DIR.exists() else []
)
def test_reference_config_keys_covered(name):
    repo_path = REPO_DIR / name
    assert repo_path.exists(), f"reference config {name} has no repo counterpart"
    ref = _flatten(yaml.safe_load((REF_DIR / name).read_text()) or {})
    repo = _flatten(yaml.safe_load(repo_path.read_text()) or {})
    missing = [k for k in ref if k not in repo and not _allowed(k)]
    assert not missing, (
        f"{name}: reference keys neither present in the repo config nor in "
        f"the deliberate-divergence allowlist: {missing}"
    )


@pytest.mark.skipif(not REF_DIR.exists(), reason="reference tree unavailable")
def test_allowlist_not_stale():
    """Every allowlist pattern still matches at least one reference key that
    is actually missing from the repo side — otherwise the divergence was
    fixed and the entry should be deleted."""
    all_missing = set()
    for f in REF_DIR.glob("*.yaml"):
        ref = _flatten(yaml.safe_load(f.read_text()) or {})
        repo_path = REPO_DIR / f.name
        repo = _flatten(yaml.safe_load(repo_path.read_text()) or {}) if repo_path.exists() else {}
        all_missing |= {k for k in ref if k not in repo}
    stale = [p for p in ALLOW if not any(fnmatch(k, p) for k in all_missing)]
    assert not stale, f"allowlist entries no longer needed: {stale}"


# ---------------------------------------------------------------------------
# dataset default_conf key-surface audit (VERDICT r4 next #3): the YAML audit
# above cannot see defaults baked into class dicts — both r4 findings
# (photometric p, load_features) lived there. Reference default_confs are
# extracted STATICALLY via ast (no torch import), resolving the known
# `ImagePreprocessor.default_conf` / `**CacheLoader.default_conf` indirections.
# ---------------------------------------------------------------------------

import ast

REF_ROOT = Path("/root/reference/gluefactory")
_REF_CONF_CLASSES = {
    "ImagePreprocessor": REF_ROOT / "utils/image.py",
    "CacheLoader": REF_ROOT / "models/cache_loader.py",
}

# "<dataset>:<dotted reference key>" globs -> reason the repo key surface
# deliberately diverges. Staleness-checked like ALLOW above.
DS_ALLOW = {
    "*:load_features.device": (
        "torch device-placement knob; the repo loads host numpy and places "
        "arrays via prepare_batch/pjit on the main process (CLAUDE.md)"
    ),
    "*:load_features.trainable": (
        "the reference CacheLoader is a BaseModel carrying the generic "
        "trainable flag (never trained); the repo loader is a plain callable"
    ),
    "*:load_features.padding_fn": (
        "CacheLoader pads built-in (pad_local_features); the reference "
        "passes a pad fn by name — same divergence as the YAML allowlist"
    ),
    "*:load_features.add_data_path": (
        "repo CacheLoader resolves relative paths under DATA_PATH "
        "automatically (models/cache_loader.py _file); absolute paths bypass"
    ),
    "eth3d:min_overlap": (
        "declared but UNUSED in the reference eth3d (pairs are filtered by "
        "min_covisibility only, reference eth3d.py:135-151); dead key omitted"
    ),
    "eth3d:max_overlap": "see eth3d:min_overlap",
    "eth3d:sort_by_overlap": "see eth3d:min_overlap",
    "base:num_threads": (
        "torch.set_num_threads knob for torch workers; the numpy loader has "
        "no intra-op thread pool (XLA manages host threading)"
    ),
}

_DATASET_MODULES = [
    "eth3d",
    "homographies",
    "hpatches",
    "image_folder",
    "image_pairs",
    "megadepth",
    "posed_images",
    "zeb",
]


def _ref_class_dict(path: Path, attr: str = "default_conf", cls_hint=None):
    for node in ast.walk(ast.parse(path.read_text())):
        if isinstance(node, ast.ClassDef) and (cls_hint is None or node.name == cls_hint):
            for stmt in node.body:
                if (
                    isinstance(stmt, ast.Assign)
                    and isinstance(stmt.value, ast.Dict)
                    and any(isinstance(t, ast.Name) and t.id == attr for t in stmt.targets)
                ):
                    return stmt.value
    raise AssertionError(f"no {attr} dict found in {path}")


def _resolve_conf_attr(v):
    """X.default_conf attribute reference -> that class's dict node."""
    if (
        isinstance(v, ast.Attribute)
        and v.attr == "default_conf"
        and isinstance(v.value, ast.Name)
        and v.value.id in _REF_CONF_CLASSES
    ):
        return _ref_class_dict(_REF_CONF_CLASSES[v.value.id], cls_hint=v.value.id)
    return None


def _ast_dict_keys(node: ast.Dict, pre: str = "") -> set:
    keys = set()
    for k, v in zip(node.keys, node.values):
        if k is None:  # **splat
            sub = _resolve_conf_attr(v)
            assert sub is not None, f"unresolvable **splat: {ast.dump(v)}"
            keys |= _ast_dict_keys(sub, pre)
        else:
            assert isinstance(k, ast.Constant), ast.dump(k)
            name = pre + str(k.value)
            sub = _resolve_conf_attr(v)
            if sub is not None:
                keys |= _ast_dict_keys(sub, name + ".")
            elif isinstance(v, ast.Dict) and v.keys:
                keys |= _ast_dict_keys(v, name + ".")
            else:
                keys.add(name)
    return keys


def _repo_dataset_keys(name: str) -> set:
    from gluefactory_tpu.data import get_dataset
    from gluefactory_tpu.data.preprocess import ImagePreprocessor

    cls = get_dataset(name)
    merged = dict(cls.base_default_conf, **cls.default_conf)
    keys = set(_flatten(merged))
    # every dataset forwards conf.preprocessing verbatim to ImagePreprocessor
    # (which merges its own defaults), so that sub-surface is runtime-covered
    if "preprocessing" in merged:
        keys |= {f"preprocessing.{k}" for k in ImagePreprocessor.default_conf}
        keys.discard("preprocessing")
    return keys


def _ds_allowed(dataset: str, key: str) -> bool:
    return any(fnmatch(f"{dataset}:{key}", pat) for pat in DS_ALLOW)


@pytest.mark.skipif(not REF_ROOT.exists(), reason="reference tree unavailable")
@pytest.mark.parametrize("name", _DATASET_MODULES)
def test_reference_dataset_default_conf_covered(name):
    ref_keys = _ast_dict_keys(_ref_class_dict(REF_ROOT / f"datasets/{name}.py"))
    repo_keys = _repo_dataset_keys(name)
    missing = sorted(
        k for k in ref_keys if k not in repo_keys and not _ds_allowed(name, k)
    )
    assert not missing, (
        f"dataset {name}: reference default_conf keys neither in the repo "
        f"default_conf nor in DS_ALLOW: {missing}"
    )


@pytest.mark.skipif(not REF_ROOT.exists(), reason="reference tree unavailable")
def test_reference_base_dataset_conf_covered():
    from gluefactory_tpu.data.base_dataset import BaseDataset

    ref_keys = _ast_dict_keys(
        _ref_class_dict(REF_ROOT / "datasets/base_dataset.py", attr="base_default_conf")
    )
    repo_keys = set(_flatten(dict(BaseDataset.base_default_conf)))
    missing = sorted(
        k for k in ref_keys if k not in repo_keys and not _ds_allowed("base", k)
    )
    assert not missing, missing


@pytest.mark.skipif(not REF_ROOT.exists(), reason="reference tree unavailable")
def test_ds_allowlist_not_stale():
    all_missing = set()
    for name in _DATASET_MODULES:
        ref_keys = _ast_dict_keys(_ref_class_dict(REF_ROOT / f"datasets/{name}.py"))
        repo_keys = _repo_dataset_keys(name)
        all_missing |= {f"{name}:{k}" for k in ref_keys if k not in repo_keys}
    from gluefactory_tpu.data.base_dataset import BaseDataset

    ref_base = _ast_dict_keys(
        _ref_class_dict(REF_ROOT / "datasets/base_dataset.py", attr="base_default_conf")
    )
    repo_base = set(_flatten(dict(BaseDataset.base_default_conf)))
    all_missing |= {f"base:{k}" for k in ref_base if k not in repo_base}
    stale = [p for p in DS_ALLOW if not any(fnmatch(k, p) for k in all_missing)]
    assert not stale, f"DS_ALLOW entries no longer needed: {stale}"


def test_plot_hook_in_training_recipes():
    """The reference training recipes carry a `train.plot` figure hook; the
    repo recipes must keep it wired (VERDICT r2 weak #5)."""
    for name in [
        "superpoint+lightglue_homography.yaml",
        "superpoint+lightglue_megadepth.yaml",
        "aliked+lightglue_megadepth.yaml",
    ]:
        conf = yaml.safe_load((REPO_DIR / name).read_text())
        plot = conf["train"]["plot"]
        assert plot[0] == 5 and "make_match_figures" in plot[1]
        import pydoc

        assert pydoc.locate(plot[1]) is not None, plot[1]
