"""Public API surface imports and exposes everything advertised."""


def test_api_surface():
    from peps_tpu import api
    for name in api.__all__:
        assert hasattr(api, name), name
