import os
import textwrap

from visinger_tpu.config import load_config, parse_overrides


def test_builtin_config_loads():
    cfg = load_config(name="visinger_csd")
    assert cfg.hidden_size == 192
    assert cfg.hop_size == 300
    assert tuple(cfg.upsample_rates) == (5, 5, 3, 2, 2)
    # product of upsample rates must equal hop size (decoder invariant)
    prod = 1
    for u in cfg.upsample_rates:
        prod *= u
    assert prod == cfg.hop_size


def test_inheritance_and_override(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("a: 1\nnested:\n  x: 1\n  y: 2\n")
    child = tmp_path / "child.yaml"
    child.write_text(
        textwrap.dedent(
            """
            base_config:
              - ./base.yaml
            a: 3
            nested:
              y: 5
            """
        )
    )
    cfg = load_config(str(child))
    assert cfg.a == 3
    assert cfg.nested.x == 1 and cfg.nested.y == 5


def test_cli_overrides():
    ov = parse_overrides("a=1,b.c=2.5,d=[1, 2, 3],e=hello")
    assert ov == {"a": 1, "b": {"c": 2.5}, "d": [1, 2, 3], "e": "hello"}
    cfg = load_config(name="visinger_csd", overrides="hidden_size=64")
    assert cfg.hidden_size == 64


def test_config_immutable():
    cfg = load_config(name="visinger_csd")
    try:
        cfg.hidden_size = 1
        raise AssertionError("should be immutable")
    except TypeError:
        pass
