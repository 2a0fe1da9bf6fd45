"""HTTP I/O strategy: SDSSDataSet reading raw FITS bytes from a file server
(the reference's masterrpc / nginx HTTPStrategy replacement,
SDSSIO.jl:677-692, contrib/http/httpio.jl)."""

import functools
import http.server
import threading

import numpy as np
import pytest

from celeste_jl_tpu.io.sdss import SDSSDataSet
from sdss_fixtures import make_sdss_field


@pytest.fixture(scope="module")
def field_dir(tmp_path_factory):
    basedir = tmp_path_factory.mktemp("sdss_http")
    rcf, truth, wcs = make_sdss_field(str(basedir))
    return basedir, rcf, truth


@pytest.fixture(scope="module")
def http_base(field_dir):
    basedir, _, _ = field_dir
    handler = functools.partial(http.server.SimpleHTTPRequestHandler,
                                directory=str(basedir))
    server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()


def test_http_strategy_autodetected(http_base):
    ds = SDSSDataSet(http_base)
    assert ds.iostrategy == "http"
    assert SDSSDataSet("/data/sdss").iostrategy == "plain"


def test_http_images_match_plain(field_dir, http_base):
    basedir, rcf, _ = field_dir
    plain = SDSSDataSet(str(basedir)).load_field_images(rcf)
    http = SDSSDataSet(http_base).load_field_images(rcf)
    assert len(plain) == len(http) == 5
    for a, b in zip(plain, http):
        np.testing.assert_array_equal(a.pixels, b.pixels)
        np.testing.assert_allclose(a.nelec_per_nmgy, b.nelec_per_nmgy)
        assert a.band == b.band


def test_http_field_catalog(field_dir, http_base):
    basedir, rcf, truth = field_dir
    cat = SDSSDataSet(http_base).load_field_catalog(rcf)
    assert len(cat) == len(truth)
