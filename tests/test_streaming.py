"""StreamingReviser (jnp fallback on CPU) agrees with the chunked engine."""

import dataclasses

import numpy as np
import pytest

from nanoreviser_tpu.io import get_read_data


@pytest.fixture(scope="module")
def truncated_read(unitest_fast5_files):
    rd = get_read_data(str(unitest_fast5_files[0]))
    n = 200
    return dataclasses.replace(
        rd,
        starts=rd.starts[:n],
        lengths=rd.lengths[:n],
        bases=rd.bases[:n],
        ab_mean=rd.ab_mean[:n],
        ab_std=rd.ab_std[:n],
    )


@pytest.mark.slow
def test_streaming_matches_engine(ecoli_model_paths, truncated_read):
    from nanoreviser_tpu.infer import ReviserEngine, StreamingReviser

    m1, m2 = ecoli_model_paths
    engine = ReviserEngine(str(m1), str(m2), chunk=64)
    streaming = StreamingReviser(str(m1), str(m2))
    assert not streaming._use_pallas  # CPU test exercises the jnp fallback

    seq_e = engine.revise_read(truncated_read)
    seq_s = streaming.revise_read(truncated_read)
    assert seq_e == seq_s


@pytest.mark.slow
def test_streaming_error_degrades_to_passthrough(ecoli_model_paths, truncated_read):
    from nanoreviser_tpu.infer import StreamingReviser

    m1, m2 = ecoli_model_paths
    streaming = StreamingReviser(str(m1), str(m2))
    bad = dataclasses.replace(truncated_read, starts=np.zeros(0, np.int64))
    errors = []
    out = list(
        streaming.revise_stream(
            [("bad.fast5", bad), ("ok.fast5", truncated_read)], errors=errors
        )
    )
    assert [name for name, _, _ in out] == ["bad.fast5", "ok.fast5"]
    assert out[0][2] == bad.bases          # degraded to original bases
    assert len(errors) == 1 and errors[0][0] == "bad.fast5"
