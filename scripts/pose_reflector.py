#!/usr/bin/env python
"""Pose-reflector service stub.

Equivalent of the reference's ``ros2/src/pose_reflector`` package
(ros2/src/pose_reflector/pose_reflector/main.py:8-28): a stand-in for
Autoware's NDT align service that simply reflects the request pose back
(``/localization/pose_estimator/ndt_align_srv``) and acks trigger
requests (``/localization/pose_estimator/trigger_node``). Used when
wiring up the localizer stack without a real NDT node; here it speaks
the same line-delimited JSON-over-TCP convention as apps/serve.py:

  {"cmd": "align", "pose": ..., "covariance": ...}
      -> {"ok": true, "success": true, "pose": ..., "covariance": ...}
  {"cmd": "trigger", "data": true|false}
      -> {"ok": true, "success": true}
"""

from __future__ import annotations

import argparse
import json
import socketserver
import threading


def handle(req: dict) -> dict:
    cmd = req.get("cmd")
    if cmd == "align":
        resp = {"ok": True, "success": True, "pose": req.get("pose")}
        if "covariance" in req:
            resp["covariance"] = req["covariance"]
        return resp
    if cmd == "trigger":
        return {"ok": True, "success": True}
    if cmd == "shutdown":
        return {"ok": True, "shutdown": True}
    return {"ok": False, "error": f"unknown cmd {req.get('cmd')!r}"}


class _Handler(socketserver.StreamRequestHandler):
    def handle(self):
        while True:
            line = self.rfile.readline()
            if not line:
                break
            try:
                resp = handle(json.loads(line))
            except Exception as e:  # noqa: BLE001
                resp = {"ok": False, "error": str(e)}
            self.wfile.write((json.dumps(resp) + "\n").encode())
            self.wfile.flush()
            if resp.get("shutdown"):
                threading.Thread(target=self.server.shutdown).start()
                break


class Server(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True


def serve(host: str = "127.0.0.1", port: int = 0) -> Server:
    return Server((host, port), _Handler)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=7012)
    args = ap.parse_args()
    srv = serve(args.host, args.port)
    print(f"pose reflector on {srv.server_address}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
