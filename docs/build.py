"""Static documentation site builder (no network, no mkdocs/sphinx in
this environment — stdlib + the baked-in ``markdown``/``pygments``).

    python docs/build.py          # writes docs/_site/
    python docs/build.py --check  # build, fail on any error (CI)

Renders every docs/*.md plus the README as a navigable HTML site and
generates a cross-referenced API reference from the live package
docstrings (counterpart of the reference's Sphinx tree,
/root/reference/docs/source/).
"""

import argparse
import html
import importlib
import inspect
import os
import pkgutil
import shutil
import sys

import markdown

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = os.path.join(ROOT, "docs")
SITE = os.path.join(DOCS, "_site")

NAV = [
    ("index", "Overview", os.path.join(ROOT, "README.md")),
    ("quickstart", "Quickstart", None),
    ("architecture", "Architecture", None),
    ("serving", "Serving", None),
    ("storage", "Storage", None),
    ("codec", "CacheGen codec", None),
    ("kernels", "TPU kernels", None),
    ("mla", "MLA / latent KV", None),
    ("developer_tutorial", "Developer tutorial", None),
    ("api", "API reference", None),
]

CSS = """
:root { --fg:#1a1d21; --bg:#ffffff; --accent:#0b57d0; --mut:#5f6368;
        --line:#e3e5e8; --codebg:#f6f8fa; }
@media (prefers-color-scheme: dark) {
  :root { --fg:#e8eaed; --bg:#17191c; --accent:#8ab4f8; --mut:#9aa0a6;
          --line:#33373c; --codebg:#24262b; } }
* { box-sizing: border-box; }
body { margin:0; font:16px/1.6 system-ui,-apple-system,sans-serif;
       color:var(--fg); background:var(--bg); display:flex; }
nav { width:240px; min-height:100vh; border-right:1px solid var(--line);
      padding:24px 16px; flex-shrink:0; position:sticky; top:0;
      align-self:flex-start; }
nav h1 { font-size:17px; margin:0 0 16px; }
nav a { display:block; color:var(--mut); text-decoration:none;
        padding:5px 10px; border-radius:6px; font-size:14px; }
nav a:hover { color:var(--fg); background:var(--codebg); }
nav a.cur { color:var(--accent); font-weight:600; }
main { max-width:860px; padding:32px 48px; min-width:0; }
h1,h2,h3 { line-height:1.25; } h1 { font-size:28px; }
h2 { margin-top:2em; border-bottom:1px solid var(--line);
     padding-bottom:.25em; }
a { color:var(--accent); }
pre { background:var(--codebg); border:1px solid var(--line);
      border-radius:8px; padding:12px 14px; overflow-x:auto;
      font-size:13px; line-height:1.5; }
code { font-family:ui-monospace,SFMono-Regular,Menlo,monospace;
       font-size:.9em; background:var(--codebg); border-radius:4px;
       padding:.1em .3em; }
pre code { background:none; padding:0; }
table { border-collapse:collapse; font-size:14px; margin:1em 0; }
th,td { border:1px solid var(--line); padding:6px 12px; text-align:left; }
th { background:var(--codebg); }
.sig { background:var(--codebg); border-left:3px solid var(--accent);
       padding:8px 12px; border-radius:0 6px 6px 0; margin:1.5em 0 .5em;
       font-family:ui-monospace,Menlo,monospace; font-size:13px;
       white-space:pre-wrap; }
.doc { margin-left:12px; white-space:pre-wrap; font-size:14px;
       color:var(--mut); }
.mod { margin-top:3em; }
"""

PAGE = """<!doctype html><html><head><meta charset="utf-8">
<meta name="viewport" content="width=device-width,initial-scale=1">
<title>{title} — lmcache-tpu</title><style>{css}</style></head>
<body><nav><h1>lmcache-tpu</h1>{nav}</nav>
<main>{body}</main></body></html>"""

API_MODULES = [
    "lmcache_tpu",
    "lmcache_tpu.cache_engine",
    "lmcache_tpu.config",
    "lmcache_tpu.utils",
    "lmcache_tpu.blend",
    "lmcache_tpu.integration",
    "lmcache_tpu.protocol",
    "lmcache_tpu.metrics",
    "lmcache_tpu.storage",
    "lmcache_tpu.storage.abstract_backend",
    "lmcache_tpu.storage.local_backend",
    "lmcache_tpu.storage.remote_backend",
    "lmcache_tpu.storage.hybrid_backend",
    "lmcache_tpu.storage.serde.serde",
    "lmcache_tpu.storage.serde.cachegen_serde",
    "lmcache_tpu.storage.connector",
    "lmcache_tpu.codec.cachegen_config",
    "lmcache_tpu.codec.range_coder",
    "lmcache_tpu.ops.attention",
    "lmcache_tpu.ops.paged_attention",
    "lmcache_tpu.ops.quant",
    "lmcache_tpu.ops.range_decode",
    "lmcache_tpu.ops.range_encode",
    "lmcache_tpu.serving.engine",
    "lmcache_tpu.serving.paged_engine",
    "lmcache_tpu.serving.api",
    "lmcache_tpu.parallel.mesh",
    "lmcache_tpu.server",
]


def render_nav(cur):
    out = []
    for slug, title, _ in NAV:
        cls = ' class="cur"' if slug == cur else ""
        out.append(f'<a href="{slug}.html"{cls}>{title}</a>')
    return "\n".join(out)


def md_to_html(text):
    return markdown.markdown(
        text, extensions=["tables", "fenced_code", "codehilite"],
        extension_configs={"codehilite": {"guess_lang": False,
                                          "noclasses": True}})


def build_api_page():
    parts = ["<h1>API reference</h1>",
             "<p>Generated from the live package docstrings; file/line "
             "references inside them point at the upstream reference "
             "implementation for parity checks.</p>"]
    for name in API_MODULES:
        try:
            mod = importlib.import_module(name)
        except Exception as e:  # pragma: no cover - optional deps
            parts.append(f'<div class="mod"><h2>{name}</h2>'
                         f"<p><em>not importable here: "
                         f"{html.escape(str(e))}</em></p></div>")
            continue
        parts.append(f'<div class="mod"><h2 id="{name}">{name}</h2>')
        if mod.__doc__:
            parts.append('<div class="doc">'
                         + html.escape(inspect.cleandoc(mod.__doc__))
                         + "</div>")
        for attr, obj in sorted(vars(mod).items()):
            if attr.startswith("_"):
                continue
            if getattr(obj, "__module__", None) != name:
                continue
            if inspect.isclass(obj):
                parts.append(_render_class(attr, obj))
            elif inspect.isfunction(obj):
                parts.append(_render_func(attr, obj))
        parts.append("</div>")
    return "\n".join(parts)


def _sig(obj):
    try:
        return html.escape(str(inspect.signature(obj)))
    except (TypeError, ValueError):
        return "(...)"


def _doc(obj):
    d = inspect.getdoc(obj)
    return ('<div class="doc">' + html.escape(d) + "</div>") if d else ""


def _render_func(name, fn):
    return (f'<div class="sig">def {name}{_sig(fn)}</div>' + _doc(fn))


def _render_class(name, cls):
    out = [f'<div class="sig">class {name}{_sig(cls)}</div>', _doc(cls)]
    for m, obj in sorted(vars(cls).items()):
        if m.startswith("_") or not (inspect.isfunction(obj)
                                     or isinstance(obj, staticmethod)):
            continue
        fn = obj.__func__ if isinstance(obj, staticmethod) else obj
        out.append(f'<div class="sig" style="margin-left:24px">'
                   f'{name}.{m}{_sig(fn)}</div>')
        d = inspect.getdoc(fn)
        if d:
            out.append('<div class="doc" style="margin-left:36px">'
                       + html.escape(d) + "</div>")
    return "\n".join(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    # pin the CPU platform BEFORE the API-reference imports pull in jax:
    # in this environment the TPU plugin overrides the JAX_PLATFORMS
    # env var, and a docs build must never attach to the accelerator
    # (see tests/conftest.py for the same dance)
    os.environ["JAX_PLATFORMS"] = "cpu"
    try:
        import jax
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    sys.path.insert(0, ROOT)

    shutil.rmtree(SITE, ignore_errors=True)
    os.makedirs(SITE)
    n = 0
    for slug, title, src in NAV:
        if slug == "api":
            body = build_api_page()
        else:
            path = src or os.path.join(DOCS, f"{slug}.md")
            with open(path) as f:
                body = md_to_html(f.read())
        nav = render_nav(slug)
        with open(os.path.join(SITE, f"{slug}.html"), "w") as f:
            f.write(PAGE.format(title=title, css=CSS, nav=nav, body=body))
        n += 1
    print(f"built {n} pages -> {os.path.relpath(SITE, ROOT)}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
