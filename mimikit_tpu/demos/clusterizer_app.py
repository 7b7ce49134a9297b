"""Launch the clusterizer notebook app (reference ``demos/clusterizer_app.py``)."""


def demo():
    import mimikit_tpu as mmk

    try:
        import IPython.display as ipd
        from ipywidgets import widgets as W

        ipd.display(mmk.ui.style_sheet.get_style_sheet())
        ipd.display(
            W.HTML("<style>.container { width: 95% !important; }</style>")
        )
    except ImportError:
        pass
    app = mmk.ClusterizerApp()
    try:
        import IPython.display as ipd

        ipd.display(app.widget)
    except ImportError:
        pass
    return app
