import pytest

from gluefactory_tpu.core.config import Config, from_dotlist, from_yaml, merge


def test_basic_access():
    c = Config({"a": 1, "b": {"c": [1, 2], "d": "x"}})
    assert c.a == 1
    assert c["b"].c == (1, 2)
    assert c.b.d == "x"
    assert c.select("b.d") == "x"
    assert c.select("b.missing", 7) == 7


def test_immutable_and_hashable():
    c = Config({"a": {"b": 2}})
    with pytest.raises(TypeError):
        c.a = 3
    assert hash(c) == hash(Config({"a": {"b": 2}}))
    assert c == Config({"a": {"b": 2}})
    assert c != Config({"a": {"b": 3}})


def test_merge_overrides():
    base = Config({"a": 1, "b": {"c": 2, "d": 3}})
    out = merge(base, {"b": {"c": 9}})
    assert out.b.c == 9 and out.b.d == 3 and out.a == 1


def test_strict_merge_raises_on_unknown():
    base = Config({"a": 1, "b": {"c": 2}})
    with pytest.raises(KeyError):
        merge(base, {"b": {"typo": 1}}, strict=True)
    # empty dict default = open container
    base2 = Config({"a": 1, "open": {}})
    out = merge(base2, {"open": {"anything": 5}}, strict=True)
    assert out.open.anything == 5


def test_dotlist():
    c = from_dotlist(["train.lr=1e-4", "model.name=two_view_pipeline", "flag=true"])
    assert c.train.lr == 1e-4
    assert c.model.name == "two_view_pipeline"
    assert c.flag is True


def test_yaml_roundtrip():
    c = Config({"x": {"y": 1.5}, "z": [1, 2]})
    c2 = from_yaml(c.to_yaml())
    assert c == c2


def test_set_dotted():
    c = Config({"a": {"b": 1}})
    c2 = c.set("a.b", 5).set("a.new", 7)
    assert c2.a.b == 5 and c2.a.new == 7 and c.a.b == 1


def test_all_shipped_configs_parse_and_resolve():
    """Every yaml under configs/ must parse, and its model section (when
    present) must resolve through the registry to constructible confs."""
    from pathlib import Path

    from gluefactory_tpu.models import get_model

    cfg_dir = Path(__file__).parent.parent / "gluefactory_tpu" / "configs"
    files = sorted(cfg_dir.glob("*.yaml"))
    assert len(files) >= 25
    for f in files:
        conf = from_yaml(str(f))
        model = conf.get("model") if hasattr(conf, "get") else None
        if model is None or "name" not in model:
            continue
        name = model["name"]
        try:
            cls = get_model(name)
        except ImportError:
            continue  # gated third-party wrapper
        assert cls is not None, f.name


def test_lr_schedule_chained_and_custom():
    """lr_schedule as a LIST composes multiplicatively; a dotted-path type
    resolves to an arbitrary callable (reference train.py:144-174 accepts
    any scheduler class + chained schedulers)."""
    import numpy as np

    from gluefactory_tpu.core.config import Config
    from gluefactory_tpu.train import build_lr_schedule, default_train_conf
    from gluefactory_tpu.core.config import merge

    conf = merge(
        Config(default_train_conf),
        {
            "lr": 1e-3,
            "epochs": 10,
            "lr_schedule": [
                {"type": "exp", "start": 0, "exp_div_10": 10},
                {"type": "factor", "factor": 0.5, "on_epoch": [2]},
            ],
        },
    )
    sched = build_lr_schedule(conf, steps_per_epoch=10)
    # epoch 5: exp decay 10^(-5/10) and one 0.5 factor from epoch 2
    expected = 1e-3 * 10 ** (-0.5) * 0.5
    np.testing.assert_allclose(float(sched(50)), expected, rtol=1e-5)

    conf2 = merge(
        Config(default_train_conf),
        {"lr": 2.0, "lr_schedule": {"type": "tests.test_config._half_lr"}},
    )
    sched2 = build_lr_schedule(conf2, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched2(0)), 1.0)


def _half_lr(step, epoch, lr, conf):
    return lr * 0.5
