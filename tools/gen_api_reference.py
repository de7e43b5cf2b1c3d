"""Generate docs/api_reference.md from the package's public surface.

Walks every module under ``behavenet_tpu``, imports it, and emits a
markdown index of public classes (with their public methods) and
functions, each with the first line of its docstring. The reference ships
narrative guides only (docs/source/*.rst); this adds the API index a
framework user expects, kept honest by being generated from the live
docstrings rather than written by hand.

Run on CPU:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/gen_api_reference.py
"""

import importlib
import inspect
import os
import pkgutil
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import behavenet_tpu  # noqa: E402

SKIP_MODULES = {'behavenet_tpu._native'}


def first_line(obj):
    doc = inspect.getdoc(obj)
    if not doc:
        return ''
    line = doc.strip().splitlines()[0].strip()
    return line


def iter_modules():
    yield 'behavenet_tpu', behavenet_tpu
    for info in pkgutil.walk_packages(behavenet_tpu.__path__, 'behavenet_tpu.'):
        if any(info.name == s or info.name.startswith(s + '.') for s in SKIP_MODULES):
            continue
        try:
            yield info.name, importlib.import_module(info.name)
        except Exception as e:  # pragma: no cover - import guard
            print('skipping %s: %s' % (info.name, e), file=sys.stderr)


def public_members(mod, name):
    """(classes, functions) defined in this module (not re-exports)."""
    classes, funcs = [], []
    for attr, obj in sorted(vars(mod).items()):
        if attr.startswith('_'):
            continue
        if getattr(obj, '__module__', None) != name:
            continue
        if inspect.isclass(obj):
            classes.append((attr, obj))
        elif inspect.isfunction(obj):
            funcs.append((attr, obj))
    return classes, funcs


def class_methods(cls):
    out = []
    for attr, obj in sorted(vars(cls).items()):
        if attr.startswith('_'):
            continue
        if inspect.isfunction(obj) or isinstance(obj, (staticmethod, classmethod)):
            fn = obj.__func__ if isinstance(obj, (staticmethod, classmethod)) else obj
            out.append((attr, fn))
    return out


def signature(fn):
    try:
        return str(inspect.signature(fn))
    except (TypeError, ValueError):
        return '(...)'


def main(out_path=None):
    out_path = out_path or os.path.join(ROOT, 'docs', 'api_reference.md')
    lines = [
        '# API reference',
        '',
        'Generated from live docstrings by `tools/gen_api_reference.py` — '
        'regenerate after changing any public surface:',
        '',
        '```bash',
        'PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/gen_api_reference.py',
        '```',
        '',
    ]
    for name, mod in iter_modules():
        classes, funcs = public_members(mod, name)
        if not classes and not funcs:
            continue
        lines.append('## `%s`' % name)
        mod_doc = first_line(mod)
        if mod_doc:
            lines.append('')
            lines.append(mod_doc)
        lines.append('')
        for attr, cls in classes:
            lines.append('### class `%s%s`' % (attr, signature(cls.__init__)
                                               .replace('(self, ', '(').replace('(self)', '()')))
            doc = first_line(cls)
            if doc:
                lines.append('')
                lines.append(doc)
            methods = [(m, f) for m, f in class_methods(cls)]
            if methods:
                lines.append('')
                for m, f in methods:
                    doc = first_line(f)
                    lines.append('- `%s%s`%s' % (
                        m, signature(f).replace('(self, ', '(').replace('(self)', '()'),
                        (' — %s' % doc) if doc else ''))
            lines.append('')
        for attr, fn in funcs:
            doc = first_line(fn)
            lines.append('### `%s%s`' % (attr, signature(fn)))
            if doc:
                lines.append('')
                lines.append(doc)
            lines.append('')
    text = '\n'.join(lines).rstrip() + '\n'
    with open(out_path, 'w') as f:
        f.write(text)
    n_mod = text.count('\n## ')
    print('wrote %s (%d modules, %d lines)' % (out_path, n_mod, text.count('\n')))


if __name__ == '__main__':
    main(sys.argv[1] if len(sys.argv) > 1 else None)
