'''Guided setup (-s) and settings layering: the overrides JSON replaces
the reference's self-rewriting settings.py
(reference modify_settings.py:19-188, settings.py:22-71).'''

import importlib
import json


def test_run_setup_writes_overrides(tmp_path, monkeypatch):
    import tscode_tpu.modify_settings as ms

    path = tmp_path / 'settings.json'
    monkeypatch.setattr(ms, 'SETTINGS_PATH', str(path))

    answers = iter(['NONE',      # calculator
                    'n',         # FF pre-opt
                    '8',         # procs
                    '2',         # threads
                    '6'])        # mem GB
    monkeypatch.setattr('builtins.input', lambda prompt='': next(answers))

    ms.run_setup()
    saved = json.loads(path.read_text())
    assert saved['CALCULATOR'] is None
    assert saved['FF_OPT_BOOL'] is False
    assert saved == {**saved, 'PROCS': 8, 'THREADS': 2, 'MEM_GB': 6.0}


def test_setup_validates_and_reprompts(tmp_path, monkeypatch):
    import tscode_tpu.modify_settings as ms

    path = tmp_path / 'settings.json'
    monkeypatch.setattr(ms, 'SETTINGS_PATH', str(path))

    answers = iter(['QUANTUMESPRESSO',   # invalid -> reprompt
                    'XTB', 'y', 'notanint', '4', '4', '4'])
    monkeypatch.setattr('builtins.input', lambda prompt='': next(answers))

    ms.run_setup()
    saved = json.loads(path.read_text())
    assert saved['CALCULATOR'] == 'XTB'
    assert saved['PROCS'] == 4


def test_settings_layering_reads_overrides(tmp_path, monkeypatch):
    '''settings.py layers the JSON overrides over autodetected defaults.'''
    import tscode_tpu.modify_settings as ms
    import tscode_tpu.settings as settings

    path = tmp_path / 'settings.json'
    path.write_text(json.dumps({'CALCULATOR': 'ORCA', 'PROCS': 12}))
    monkeypatch.setattr(ms, 'SETTINGS_PATH', str(path))

    importlib.reload(settings)
    try:
        assert settings.CALCULATOR == 'ORCA'
        assert settings.PROCS == 12
    finally:
        monkeypatch.undo()
        importlib.reload(settings)
