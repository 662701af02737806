"""Config default + validation parity tests (reference: libs/encoder.cpp:20-142)."""

import dataclasses

from svc_tpu.config import (
    DecoderConfig,
    EncoderConfig,
    KMeansParams,
    RansacParams,
    validate_decoder_config,
    validate_encoder_config,
)
from svc_tpu.utils.errors import ErrorCode


def test_defaults_match_reference():
    # apps/encoder.cpp:28-58
    c = EncoderConfig()
    assert (c.mv_block_w, c.mv_block_h) == (16, 16)
    assert c.mv_search_range == 8
    assert c.pyr_lvl_count == 4
    assert c.ransac == RansacParams(
        subset_sz=1, inlier_thresh=7.5, success_prob=0.99, inlier_ratio=0.5
    )
    assert (c.morph_rect_w, c.morph_rect_h) == (3, 3)
    assert c.kmeans == KMeansParams(
        cluster_count=10, attempt_count=3, max_iter_count=10, epsilon=1.0
    )
    assert c.connected_components_connectivity == 4
    assert (c.transform_block_w, c.transform_block_h) == (8, 8)

    # apps/decoder.cpp:21-26
    d = DecoderConfig()
    assert d.foreground_quant_step == 1
    assert d.background_quant_step == 640
    assert (d.max_gaze_rect_w, d.max_gaze_rect_h) == (64, 64)


def test_default_config_is_valid():
    assert validate_encoder_config(EncoderConfig()).ok
    assert validate_decoder_config(DecoderConfig()).ok


def test_search_range_vs_pyramid_levels():
    c = EncoderConfig(mv_search_range=4, pyr_lvl_count=4)  # 4 // 8 == 0
    err = validate_encoder_config(c)
    assert err.code == ErrorCode.INVALID_PARAMETER
    assert "mv search" in err.message


def test_connectivity_must_be_4_or_8():
    c = EncoderConfig(connected_components_connectivity=6)
    err = validate_encoder_config(c)
    assert err.code == ErrorCode.INVALID_PARAMETER
    assert "connectivity" in err.message


def test_transform_block_must_divide_mv_block():
    c = EncoderConfig(transform_block_w=6)  # 16 % 6 != 0
    err = validate_encoder_config(c)
    assert err.code == ErrorCode.INVALID_PARAMETER

    c = EncoderConfig(transform_block_w=32)  # > mv block
    err = validate_encoder_config(c)
    assert "must be <= mv block width" in err.message


def test_nested_validation_message_prefixes():
    c = EncoderConfig(ransac=RansacParams(inlier_thresh=-1.0))
    err = validate_encoder_config(c)
    assert err.message.startswith("validating RANSAC parameters: ")

    c = EncoderConfig(kmeans=KMeansParams(epsilon=0.0))
    err = validate_encoder_config(c)
    assert err.message.startswith("validating k-means parameters: ")


def test_decoder_quant_steps_positive():
    err = validate_decoder_config(DecoderConfig(background_quant_step=0))
    assert err.code == ErrorCode.INVALID_PARAMETER


def test_encoder_config_field_order_matches_reference():
    # Field surface parity with libs/encoder.hpp:25-37 (extensions at the end)
    names = [f.name for f in dataclasses.fields(EncoderConfig)]
    assert names[:11] == [
        "mv_block_w",
        "mv_block_h",
        "mv_search_range",
        "pyr_lvl_count",
        "ransac",
        "morph_rect_w",
        "morph_rect_h",
        "kmeans",
        "connected_components_connectivity",
        "transform_block_w",
        "transform_block_h",
    ]
