"""spark-submit batch driver — the CLI of the Spark graft.

Mirrors the reference CLI surface (html2text-cli/src/main.rs:249-391):
width/decorator/wrap flags become job config; `--show-render` dumps a
sample row's render pipeline outputs instead of the reference's IR dumps.

Usage:
  spark-submit --py-files rust_html2text_spark.zip scripts/run_job.py \
      --input pages.parquet --output out/ [--width 80] [--decorator plain]
      [--buckets 16] [--salt 0] [--explain] [--show-render URL]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages parquet/iceberg path")
    ap.add_argument("--output", required=True, help="output table path")
    ap.add_argument("--width", type=int, default=80)
    ap.add_argument("--decorator", default="plain", choices=["plain", "trivial", "rich"])
    ap.add_argument("--no-link-footnotes", action="store_true")
    ap.add_argument("--no-borders", action="store_true")
    ap.add_argument("--raw", action="store_true")
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--salt", type=int, default=0)
    ap.add_argument("--master", default=None)
    ap.add_argument("--explain", action="store_true", help="print the physical plan")
    ap.add_argument("--show-text", metavar="URL", help="print one rendered doc")
    ap.add_argument("--show-render", metavar="URL", help="print one doc's render tree (IR dump)")
    ap.add_argument("--show-dom", metavar="URL", help="print one doc's DOM (IR dump)")
    ap.add_argument(
        "--show-css",
        metavar="URL",
        help="print one doc's parsed stylesheet (agent/user/author rules)",
    )
    args = ap.parse_args()

    from rust_html2text_spark.operators.render import render_pages
    from rust_html2text_spark.plans.session import get_spark
    from rust_html2text_spark.sources.sink import run_with_resume

    config_kwargs = {}
    if args.decorator != "plain":
        config_kwargs = {"decorator": args.decorator}
    else:
        config_kwargs = {
            "decorator": "plain",
            "do_decorate": True,
            "link_footnotes": not args.no_link_footnotes,
        }
    if args.no_borders:
        config_kwargs["draw_borders"] = False
    if args.raw:
        config_kwargs["raw"] = True
        config_kwargs["draw_borders"] = False

    spark = get_spark(app_name="html2text-job", master=args.master)
    pages = spark.read.parquet(args.input)

    debug_url = args.show_text or args.show_render or args.show_dom or args.show_css
    if debug_url:
        row = pages.filter(pages.url == debug_url).limit(1).collect()
        if not row:
            print("url not found", file=sys.stderr)
            sys.exit(1)
        html = bytes(row[0]["html"])
        from rust_html2text_spark.engine.api import Config, html_to_text

        config = Config(**config_kwargs)
        if args.show_dom:
            from rust_html2text_spark.engine.debug import dump_dom
            from rust_html2text_spark.engine.htmlparse import parse_html

            print(dump_dom(parse_html(html, xml_mode=config.xml)))
        elif args.show_render:
            from rust_html2text_spark.engine.debug import show_render_tree

            print(show_render_tree(html, config))
        elif args.show_css:
            # mirrors html2text-cli/src/main.rs:195-201 / dom_to_parsed_style
            from rust_html2text_spark.engine.debug import dump_parsed_style

            print(dump_parsed_style(html, config))
        else:
            print(html_to_text(html, args.width, config))
        return

    if args.explain:
        render_pages(
            pages, width=args.width, config_kwargs=config_kwargs, salt=args.salt
        ).explain("formatted")
        return

    summary = run_with_resume(
        pages,
        args.output,
        width=args.width,
        num_buckets=args.buckets,
        config_kwargs=config_kwargs,
    )
    print(summary)
    spark.stop()


if __name__ == "__main__":
    main()
