"""Static docs-site builder: ``python scripts/build_docs.py [outdir]``.

Renders the documentation tree (README.md + docs/*.md + the generated
config reference) into a navigable HTML site with code highlighting —
the rendered-docs analogue of the reference's sphinx tree
(/root/reference/docs, api.rst + generated config pages), built with
the in-image ``markdown``/``pygments`` stack (no sphinx in this image).

The config-reference page is regenerated from the entry-point
dataclasses on every build (ace_tpu.docs_gen), so the site can never
drift from the code; tests/test_docs.py builds the site in CI.
"""

import html
import os
import re
import shutil
import sys

import markdown

STYLE = """
:root { --fg: #1a1a1a; --bg: #ffffff; --accent: #0b5394;
        --side: #f4f6f8; --border: #d8dee4; --code-bg: #f6f8fa; }
* { box-sizing: border-box; }
body { margin: 0; color: var(--fg); background: var(--bg);
       font: 16px/1.6 -apple-system, "Segoe UI", Roboto, sans-serif; }
nav { position: fixed; top: 0; bottom: 0; left: 0; width: 240px;
      overflow-y: auto; background: var(--side);
      border-right: 1px solid var(--border); padding: 1.2rem 1rem; }
nav h1 { font-size: 1.05rem; margin: 0 0 .8rem; }
nav a { display: block; color: var(--accent); text-decoration: none;
        padding: .18rem 0; font-size: .95rem; }
nav a.current { font-weight: 600; }
main { margin-left: 240px; padding: 1.5rem 2.5rem 4rem;
       max-width: 60rem; }
main h1, main h2, main h3 { line-height: 1.25; }
main h2 { border-bottom: 1px solid var(--border); padding-bottom: .25rem; }
pre { background: var(--code-bg); border: 1px solid var(--border);
      border-radius: 6px; padding: .8rem 1rem; overflow-x: auto;
      font-size: .88rem; line-height: 1.45; }
code { background: var(--code-bg); border-radius: 4px;
       padding: .08em .35em; font-size: .9em; }
pre code { background: none; border: none; padding: 0; }
table { border-collapse: collapse; margin: 1rem 0; }
th, td { border: 1px solid var(--border); padding: .35rem .7rem;
         text-align: left; font-size: .92rem; }
th { background: var(--side); }
a { color: var(--accent); }
"""

PAGE = """<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>{title} — ace_tpu</title>
<style>{style}</style>
<style>{pygments}</style>
</head><body>
<nav><h1>ace_tpu</h1>{nav}</nav>
<main>{body}</main>
</body></html>
"""


def _nav(pages, current):
    return "".join(
        f'<a href="{slug}.html"'
        + (' class="current"' if slug == current else "")
        + f">{html.escape(title)}</a>"
        for slug, title, _ in pages
    )


def _title_of(md_text: str, fallback: str) -> str:
    m = re.search(r"^#\s+(.+)$", md_text, re.MULTILINE)
    return m.group(1).strip() if m else fallback


def build(outdir: str) -> list:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    from ace_tpu.docs_gen import generate

    sources = [("index", os.path.join(repo, "README.md"))]
    docs_dir = os.path.join(repo, "docs")
    for name in sorted(os.listdir(docs_dir)):
        if name.endswith(".md"):
            sources.append(
                (name[:-3], os.path.join(docs_dir, name))
            )

    pages = []
    for slug, path in sources:
        if slug == "config_reference":
            text = generate()  # always regenerated from the dataclasses
        else:
            with open(path) as f:
                text = f.read()
        pages.append((slug, _title_of(text, slug), text))

    md = markdown.Markdown(
        extensions=["fenced_code", "codehilite", "tables", "toc"],
        extension_configs={"codehilite": {"guess_lang": False}},
    )
    try:
        from pygments.formatters import HtmlFormatter

        pygments_css = HtmlFormatter().get_style_defs(".codehilite")
    except Exception:
        pygments_css = ""

    if os.path.isdir(outdir):
        shutil.rmtree(outdir)
    os.makedirs(outdir)
    for slug, title, text in pages:
        md.reset()
        # rewrite intra-repo .md links to the rendered pages
        text = re.sub(r"\((?:docs/)?(\w[\w\-]*)\.md(#[^\)]*)?\)",
                      r"(\1.html\2)", text)
        body = md.convert(text)
        with open(os.path.join(outdir, f"{slug}.html"), "w") as f:
            f.write(PAGE.format(
                title=html.escape(title), style=STYLE,
                pygments=pygments_css,
                nav=_nav(pages, slug), body=body,
            ))
    return [slug for slug, _, _ in pages]


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "docs/_site"
    built = build(out)
    print(f"built {len(built)} pages into {out}: {', '.join(built)}")
