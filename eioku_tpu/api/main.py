"""CLI entrypoint: run the API service.

Usage: python -m eioku_tpu.api.main [--config PATH] [--host H] [--port N]
(reference CLI --config handling: /root/reference/backend/src/main_api.py:251-281).
"""
from __future__ import annotations

import argparse

from eioku_tpu.api.app import create_app
from eioku_tpu.config.settings import load_config
from eioku_tpu.utils.logging import setup_logging
from eioku_tpu.web.server import run


def main() -> None:
    parser = argparse.ArgumentParser(description="eioku-tpu API service")
    parser.add_argument("--config", default=None, help="path to config JSON")
    parser.add_argument("--host", default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--db", default=None, help="database URL override")
    parser.add_argument("--no-discover", action="store_true",
                        help="skip startup video discovery")
    args = parser.parse_args()

    from eioku_tpu.utils.device import maybe_force_cpu
    maybe_force_cpu()  # EIOKU_FORCE_CPU=1: spawned test servers stay off the TPU tunnel
    setup_logging("eioku-api")
    config = load_config(args.config)
    if args.db:
        config.database_url = args.db
    if args.no_discover:
        config.auto_discover = False
    app = create_app(config)
    run(app, host=args.host, port=args.port)


if __name__ == "__main__":
    main()
