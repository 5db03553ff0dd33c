"""HTTP frontend smoke test (reference ``JavalinServer`` parity:
``/`` renders the search form, ``/result?search=`` renders the results
page with reference-shaped fields)."""

import threading
import urllib.request


def test_server_routes(ray_session, sf_dir, tmp_path_factory):
    from web_based_search_engine_ray.config import IndexConfig
    from web_based_search_engine_ray.pipelines.server import make_server
    from web_based_search_engine_ray.registry import get_index

    idx = get_index(sf_dir, IndexConfig())
    srv = make_server(idx, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    try:
        home = urllib.request.urlopen(f"{base}/", timeout=10).read().decode()
        assert "Search Page" in home and 'action="/result"' in home

        q = urllib.request.quote('spark "merge batch"')
        page = urllib.request.urlopen(
            f"{base}/result?search={q}", timeout=30
        ).read().decode()
        assert "Search Results" in page
        assert "Search keywords:" in page and "Search phrase:" in page
        assert "Parent Links:" in page and "Child Links:" in page
        # scores rendered to 4 decimals like the reference template
        assert "<h3>0." in page or "No matching document found" in page

        missing = urllib.request.urlopen(
            f"{base}/result?search=zzznope", timeout=30
        ).read().decode()
        assert "No matching document found" in missing
    finally:
        srv.shutdown()
        srv.server_close()
