"""Contract → custom Jinja-template exporter.

≅ the reference's ``export/custom_converter.py``: render a user-supplied
Jinja2 template with the contract as context (both the raw dict form and
the typed spec object are exposed).
"""

from __future__ import annotations

from raycontract.contract import DataContractSpecification


def export_custom(spec: DataContractSpecification, template_path: str) -> str:
    import os

    import jinja2

    from raycontract.export.dcs import spec_to_dict

    env = jinja2.Environment(
        loader=jinja2.FileSystemLoader(os.path.dirname(os.path.abspath(template_path))),
        autoescape=False,
        keep_trailing_newline=True,
    )
    template = env.get_template(os.path.basename(template_path))
    return template.render(datacontract=spec_to_dict(spec), spec=spec)
