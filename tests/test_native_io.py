"""Native C++ g2o reader: parity with the Python parser."""

import numpy as np
import pytest

from dpgo_tpu.io.g2o import read_g2o_file
from dpgo_tpu.io.native import native_available, read_g2o_file_native

from tests.conftest import dataset_path


@pytest.mark.parametrize("name", ["CSAIL.g2o", "sphere2500.g2o",
                                  "tinyGrid3D.g2o"])
def test_native_parser_parity(name):
    if not native_available():
        pytest.skip("native toolchain unavailable")
    p = dataset_path(name)
    a = read_g2o_file(p)
    b = read_g2o_file_native(p)
    assert a.num_poses == b.num_poses
    assert len(a) == len(b)
    assert a.d == b.d
    np.testing.assert_array_equal(a.i, b.i)
    np.testing.assert_array_equal(a.j, b.j)
    np.testing.assert_allclose(a.R, b.R, atol=1e-12)
    np.testing.assert_allclose(a.t, b.t, atol=1e-12)
    np.testing.assert_allclose(a.kappa, b.kappa, rtol=1e-9)
    # tau goes through a matrix inverse; LU vs closed-form adjugate rounding
    # differs at ~1e-11 relative.
    np.testing.assert_allclose(a.tau, b.tau, rtol=1e-9)
