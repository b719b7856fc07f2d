"""CPU-backend control leg for the serve soak (bench.py bench_serve_soak).

Runs the SAME in-process server and the same request mix as the TPU soak,
but on the in-process CPU backend — i.e. no axon tunnel transport. The
tunnel client is known to leak host RSS roughly equal to the bytes it
uploads (CLAUDE.md); the serving stack itself must not. A flat RSS here,
next to the growth measured on the TPU leg, pins the growth on the
transport rather than on the server / session / JAX-array lifecycle.

Prints one JSON line: {"cpu_rss_growth_mb": ..., "cpu_requests": ...,
"cpu_live_array_growth_mb": ...}.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _rss_mb():
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return float(line.split()[1]) / 1024.0
    return -1.0


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
        c.request("POST", "/session", body=body)
        sid0 = json.loads(c.getresponse().read())["id"]
        c.request("POST", f"/session/click?id={sid0}",
                  body=b'[{"y":99,"x":99,"ab":[20,-20],"radius":3}]')
        c.getresponse().read()
        c.request("POST", f"/session/suggest?id={sid0}&h=99&w=99", body=b"[]")
        c.getresponse().read()

        counts = [0, 0]
        errors = []
        lock = threading.Lock()

        # per-client sessions + one warm pass of each kind happen BEFORE
        # the RSS window opens, so steady-state ramp (session device
        # images, connection buffers) doesn't pollute the leak signal
        conns = []
        for ci in range(2):
            cc = http.client.HTTPConnection(host, port, timeout=1200)
            cc.request("POST", "/session", body=body)
            sid = json.loads(cc.getresponse().read())["id"]
            for kind in ("click", "netres", "suggest"):
                if kind == "netres":
                    cc.request("POST", "/colorize?fullres=0", body=body)
                elif kind == "click":
                    cc.request("POST", f"/session/click?id={sid}",
                               body=b'[{"y":9,"x":9,"ab":[20,-20],'
                                    b'"radius":3}]')
                else:
                    cc.request("POST",
                               f"/session/suggest?id={sid}&h=9&w=9",
                               body=b"[]")
                cc.getresponse().read()
            conns.append((cc, sid))

        stop_at = time.time() + args.secs

        def client(ci):
            cc, sid = conns[ci]
            i = 0
            while time.time() < stop_at:
                kind = ("click", "netres", "click", "suggest",
                        "click", "netres")[i % 6]
                y = 3 + (37 * i + 11 * ci) % 250
                x = 3 + (53 * i + 7 * ci) % 250
                try:
                    if kind == "netres":
                        cc.request("POST", "/colorize?fullres=0", body=body)
                    elif kind == "click":
                        hints = [{"y": y, "x": x, "ab": [30.0, -40.0],
                                  "radius": 3}]
                        cc.request("POST", f"/session/click?id={sid}",
                                   body=json.dumps(hints).encode())
                    else:
                        cc.request(
                            "POST",
                            f"/session/suggest?id={sid}&h={y}&w={x}",
                            body=b"[]")
                    r = cc.getresponse()
                    r.read()
                    with lock:
                        counts[0] += 1
                        if r.status >= 500:
                            errors.append(r.status)
                except OSError:
                    with lock:
                        errors.append(599)
                    cc = http.client.HTTPConnection(host, port, timeout=1200)
                i += 1

        la0 = sum(int(a.nbytes) for a in jax.live_arrays())
        rss0 = _rss_mb()
        threads = [threading.Thread(target=client, args=(ci,))
                   for ci in range(2)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        rss1 = _rss_mb()
        la1 = sum(int(a.nbytes) for a in jax.live_arrays())
        print(json.dumps({
            "cpu_rss_growth_mb": round(rss1 - rss0, 1),
            "cpu_requests": counts[0],
            "cpu_5xx": len(errors),
            "cpu_live_array_growth_mb": round((la1 - la0) / 1e6, 2),
        }))
    finally:
        srv.shutdown()
        srv.server_close()


if __name__ == "__main__":
    main()
