"""shapefile-repository CLI (reference src/cli/cli_repository.py:28-60):
register / unregister / inventory over ShapefileRepository. The
repository root is `--repository-dir` (the reference keeps it in server
config; there is no server here)."""

from __future__ import annotations

import argparse

from .common import add_common_args, jdump


def build_parser():
    parser = argparse.ArgumentParser(prog="repository",
                                     description="Shapefile repository CLI")
    add_common_args(parser)
    parser.add_argument("--repository-dir", "--repository_dir",
                        dest="repository_dir", required=True,
                        help="repository root directory")
    sub = parser.add_subparsers(dest="command", required=True)
    p = sub.add_parser("register", help="register a shapefile bundle")
    p.add_argument("--name", required=True)
    p.add_argument("--contents", required=True, help="path to bundle zip")
    p = sub.add_parser("unregister", help="remove a registered bundle")
    p.add_argument("--name", required=True)
    sub.add_parser("inventory", help="list registered bundles")
    return parser


def execute(xargs=None) -> str:
    from ..sources.repository import ShapefileRepository
    args = build_parser().parse_args(xargs)
    repo = ShapefileRepository(args.repository_dir)
    try:
        if args.command == "register":
            out = jdump(repo.register(args.name, args.contents))
        elif args.command == "unregister":
            out = jdump(repo.unregister(args.name))
        else:
            out = jdump(repo.inventory())
    except ValueError as e:
        raise SystemExit(f"Error: {e}")
    print(out)
    return out


if __name__ == "__main__":
    execute()
