"""Tests for the utility layer: math helpers, errors, CLI parsing."""

import math

import pytest

from svc_tpu.utils import cli
from svc_tpu.utils.errors import Error, ErrorCode
from svc_tpu.utils.mathx import (
    cdiv,
    closest_larger_divisible,
    pow2,
    round_half_away_from_zero,
)


class TestMath:
    def test_pow2(self):
        assert [pow2(i) for i in range(5)] == [1, 2, 4, 8, 16]

    @pytest.mark.parametrize(
        "a,x,y,expected",
        [
            (352, 16, 8, 352),  # CIF width, defaults: already divisible
            (288, 16, 8, 288),
            (1920, 16, 8, 1920),
            (1080, 16, 8, 1088),  # 1080p height needs padding
            (1, 16, 8, 16),
            (17, 16, 8, 32),
            (100, 12, 8, 120),  # lcm(12,8)=24 -> 120
        ],
    )
    def test_closest_larger_divisible(self, a, x, y, expected):
        got = closest_larger_divisible(a, x, y)
        assert got == expected
        assert got % x == 0 and got % y == 0 and got >= a
        lcm = math.lcm(x, y)
        assert got - a < lcm

    def test_round_half_away_from_zero(self):
        assert round_half_away_from_zero(0.5) == 1
        assert round_half_away_from_zero(-0.5) == -1
        assert round_half_away_from_zero(2.5) == 3
        assert round_half_away_from_zero(-2.5) == -3
        assert round_half_away_from_zero(2.4) == 2
        assert round_half_away_from_zero(-2.4) == -2

    def test_cdiv(self):
        assert cdiv(10, 3) == 4
        assert cdiv(9, 3) == 3


class TestError:
    def test_truthiness(self):
        assert not Error(ErrorCode.OK)
        assert Error(ErrorCode.INVALID_PARAMETER, "x")
        assert Error(ErrorCode.OK).ok


class _Cfg:
    def __init__(self):
        self.count = 10
        self.thresh = 7.5
        self.name = ""
        self.verbose = 1


def _opts(cfg):
    return [
        cli.Opt("count", cli.OptArgType.UINT, cli.field_setter(cfg, "count")),
        cli.Opt("thresh", cli.OptArgType.FLOAT, cli.field_setter(cfg, "thresh")),
        cli.Opt("name", cli.OptArgType.STRING, cli.field_setter(cfg, "name")),
        cli.Opt("verbose", cli.OptArgType.INT, cli.field_setter(cfg, "verbose")),
    ]


class TestCli:
    def test_basic(self):
        cfg = _Cfg()
        status, argi = cli.parse_opts(
            ["prog", "--count", "5", "--thresh", "2.25", "video.npy"],
            _opts(cfg),
        )
        assert status == cli.Status.OK
        assert argi == 5
        assert cfg.count == 5 and cfg.thresh == 2.25

    def test_double_dash_terminator(self):
        cfg = _Cfg()
        status, argi = cli.parse_opts(
            ["prog", "--count", "5", "--", "--thresh"], _opts(cfg)
        )
        assert status == cli.Status.OK
        assert argi == 4  # one past "--"
        assert cfg.count == 5 and cfg.thresh == 7.5

    def test_unknown_option(self):
        status, argi = cli.parse_opts(["prog", "--bogus", "1"], _opts(_Cfg()))
        assert status == cli.Status.UNEXPECTED_OPT_NAME
        assert argi == 1

    def test_missing_arg(self):
        status, _ = cli.parse_opts(["prog", "--count"], _opts(_Cfg()))
        assert status == cli.Status.MISSING_OPT_ARG

    def test_invalid_arg(self):
        status, _ = cli.parse_opts(["prog", "--count", "abc"], _opts(_Cfg()))
        assert status == cli.Status.INVALID_OPT_ARG

    def test_sscanf_prefix_semantics(self):
        cfg = _Cfg()
        status, _ = cli.parse_opts(["prog", "--count", "12abc"], _opts(cfg))
        assert status == cli.Status.OK
        assert cfg.count == 12

    def test_uint_negative_wraps(self):
        # sscanf %u wraps negatives modulo 2**32 (libs/cli.cpp:45-47)
        cfg = _Cfg()
        status, _ = cli.parse_opts(["prog", "--count", "-1"], _opts(cfg))
        assert status == cli.Status.OK
        assert cfg.count == (1 << 32) - 1

    def test_int_negative(self):
        cfg = _Cfg()
        status, _ = cli.parse_opts(["prog", "--verbose", "-3"], _opts(cfg))
        assert status == cli.Status.OK
        assert cfg.verbose == -3

    def test_status_messages(self):
        assert cli.status_message(cli.Status.OK) == "success"
        assert (
            cli.status_message(cli.Status.UNEXPECTED_OPT_NAME)
            == "unexpected option name"
        )
