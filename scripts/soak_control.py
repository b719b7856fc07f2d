"""CPU-backend control leg for the serve soak (bench.py bench_serve_soak).

Runs the SAME in-process server and the same request mix as the TPU soak
(via the shared ideepcolor_tpu.utils.soakload driver — one client loop
for both legs keeps the A/B comparison honest), but on the in-process
CPU backend — i.e. no axon tunnel transport. The tunnel client is known
to leak host RSS roughly equal to the bytes it uploads (CLAUDE.md); the
serving stack itself must not. A flat RSS here, next to the growth
measured on the TPU leg, pins the growth on the transport rather than on
the server / session / JAX-array lifecycle.

The mix swaps the TPU leg's "fullres" slot for "netres": full-res
frames on the CPU backend take seconds each and would reduce the
request count to a handful, starving the leak signal; the upload-bytes
profile (the quantity under test) is identical for the two kinds.

Prints one JSON line: {"cpu_rss_growth_mb": ..., "cpu_requests": ...,
"cpu_live_array_growth_mb": ...}.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=45.0)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--image", default=os.path.join(
        os.environ.get("IDEEPCOLOR_REFERENCE", "/root/reference"),
        "test_imgs/mortar_pestle.jpg"))
    args = ap.parse_args()

    import jax
    # the axon plugin ignores JAX_PLATFORMS env; this is the reliable way
    jax.config.update("jax_platforms", "cpu")

    import http.client
    import threading
    from ideepcolor_tpu.apps import serve
    from ideepcolor_tpu.utils import soakload

    body = open(args.image, "rb").read()
    srv = serve.make_server(port=0, size=args.size, auto_batch=16)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        host, port = srv.server_address
        # warm only the request classes the control exercises (netres,
        # click, suggest) so CPU compiles stay out of the RSS window
        c = http.client.HTTPConnection(host, port, timeout=1200)
        c.request("POST", "/colorize?fullres=0", body=body)
        c.getresponse().read()

        # per-client sessions + one warm pass of each kind happen BEFORE
        # the RSS window opens, so steady-state ramp (session device
        # images, connection buffers, lazy dist planes) doesn't pollute
        # the leak signal
        conns = [soakload.open_warm_session(
                     host, port, body, ("click", "netres", "suggest"),
                     timeout=1200)
                 for _ in range(2)]

        la0 = sum(int(a.nbytes) for a in jax.live_arrays())
        rss0 = soakload.rss_mb()
        counters: dict = {}
        lat, errors = soakload.run_clients(
            host, port, conns, body, args.secs,
            ("click", "netres", "click", "suggest", "click", "netres"),
            size=args.size, timeout=1200, counters=counters)
        rss1 = soakload.rss_mb()
        la1 = sum(int(a.nbytes) for a in jax.live_arrays())
        print(json.dumps({
            "cpu_rss_growth_mb": round(rss1 - rss0, 1),
            "cpu_requests": sum(len(v) for v in lat.values()),
            "cpu_5xx": len([e for e in errors if e != 599]),
            "cpu_live_array_growth_mb": round((la1 - la0) / 1e6, 2),
            # no tunnel here: any nonzero count is harness-client
            # fragility, zero pins TPU-leg reconnects on the transport
            "cpu_reconnects": counters.get("reconnects", 0),
        }))
    finally:
        srv.shutdown()
        srv.server_close()


if __name__ == "__main__":
    main()
