from cookietts_tpu.config import HParams, parse_override_string

import pytest


def test_parse_override_scalars():
    d = parse_override_string("a=1,b=2.5,c=hello,d=true,e=false,f=none")
    assert d == {"a": 1, "b": 2.5, "c": "hello", "d": True, "e": False, "f": None}


def test_parse_override_lists_and_quotes():
    d = parse_override_string("xs=[1,2,3],ys=[a,b],s='q,q',t=3.5e-4")
    assert d["xs"] == [1, 2, 3]
    assert d["ys"] == ["a", "b"]
    assert d["s"] == "q,q"
    assert d["t"] == 3.5e-4


def test_parse_override_nested_lists():
    # the reference HiFi-GAN configs carry nested dilation lists
    # (config_v1.json resblock_dilation_sizes=[[1,3,5],[1,3,5],[1,3,5]])
    d = parse_override_string(
        "resblock_dilations=[[1,3,5],[1,3,5]],empty=[],deep=[[1,[2,3]],[4]]")
    assert d["resblock_dilations"] == [[1, 3, 5], [1, 3, 5]]
    assert d["empty"] == []
    assert d["deep"] == [[1, [2, 3]], [4]]
    with pytest.raises(ValueError):
        parse_override_string("a=[[1,2],[3]")


def test_hparams_roundtrip_and_types():
    hp = HParams(lr=1e-3, steps=100, name="taco", dims=[1, 2], flag=False)
    hp.parse("lr=5e-4,steps=200,flag=true,dims=[3,4,5]")
    assert hp.lr == 5e-4 and hp.steps == 200 and hp.flag is True
    assert hp.dims == [3, 4, 5]
    hp2 = HParams.from_json(hp.to_json())
    assert hp2.values() == hp.values()


def test_hparams_unknown_key_raises():
    hp = HParams(a=1)
    with pytest.raises(KeyError):
        hp.parse("b=2")


def test_hparams_type_mismatch_raises():
    hp = HParams(a=1)
    with pytest.raises(TypeError):
        hp.set_hparam("a", "not_an_int")


def test_parse_override_whitespace_around_commas():
    # round-5 review regression: whitespace between a list/quoted value
    # and the following comma must parse (the reference PARAM_RE grammar
    # tolerates it, utils_hparam.py:32-40)
    d = parse_override_string("a=[1,2] ,b=3")
    assert d == {"a": [1, 2], "b": 3}
    d = parse_override_string('a="x" , b=3, c=[4 , 5] ')
    assert d == {"a": "x", "b": 3, "c": [4, 5]}
    with pytest.raises(ValueError):
        parse_override_string("a=[1,2] b=3")   # still needs the comma
