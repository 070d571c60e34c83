"""Driver entry points: dryrun_multichip on the 8-device virtual mesh and
entry()'s example-args consistency (the single-chip compile check itself is
the driver's job — compiling ViT-B/16 on CPU here would be slow)."""


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_dryrun_multichip_4():
    import __graft_entry__ as ge

    ge.dryrun_multichip(4)
