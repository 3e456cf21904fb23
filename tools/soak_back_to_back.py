"""Run the integer and scaled 32-tile soaks back-to-back in ONE session.

VERDICT r3 weak item 1: the recorded scaled soak (phase_b 1972 s) was
3.4x the integer soak's 588 s — far beyond the documented 2x box
variance — while BENCH_NOTES.md claims scaled-at-parity. The two
recorded artifacts were produced ~12 h apart, so box drift cannot be
excluded. This driver removes that confounder: same session, same host
state, integer first then scaled (then integer again if --abba), with
per-stage attribution captured into each artifact by campaign_soak.py
(PROTEUS_TPU_STAGE_TIMES=1 -> phase_b.campaign_stats.stage_seconds).

    python tools/soak_back_to_back.py [--tiles 32] [--size 3660]
                                      [--abba]

Writes SOAK_CAMPAIGN.json + SOAK_CAMPAIGN_SCALED.json (the same
artifacts the single-mode runs produce) plus SOAK_BACK_TO_BACK.json
summarizing the phase_b ratio.
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def run_one(mode, args):
    """One campaign_soak.py run; returns its report dict."""
    out = os.path.join(
        REPO, 'SOAK_CAMPAIGN_SCALED.json' if mode == 'scaled'
        else 'SOAK_CAMPAIGN.json')
    # both modes share one dataset root: the synthetic granules are
    # mode-independent (campaign_soak clears the manifest + outputs at
    # start), and building 32 full-size tiles twice would waste ~10 min
    # of this 1-core host between the runs being compared
    cmd = [sys.executable, os.path.join(HERE, 'campaign_soak.py'),
           '--tiles', str(args.tiles), '--size', str(args.size),
           '--kill-after-done', str(args.kill_after_done),
           '--root', args.root, '--out', out]
    if mode == 'scaled':
        cmd.append('--scaled')
    t0 = time.time()
    rc = subprocess.run(cmd, cwd=REPO).returncode
    dt = time.time() - t0
    # a stale artifact from an earlier session must never masquerade as
    # this run's result (r5 incident: all three sub-soaks crashed, the
    # pre-existing JSONs were read back, and SOAK_BACK_TO_BACK.json
    # reported phases that never executed)
    if rc != 0:
        raise RuntimeError(f'{mode} soak failed (rc={rc}); refusing to '
                           f'read {out}')
    if not os.path.isfile(out) or os.path.getmtime(out) < t0:
        raise RuntimeError(f'{mode} soak wrote no fresh {out} '
                           '(stale or missing artifact)')
    with open(out) as fh:
        rep = json.load(fh)
    print(json.dumps({'mode': mode, 'rc': rc,
                      'wall_s': round(dt, 1),
                      'phase_a_s': rep['phase_a']['seconds'],
                      'phase_b_s': rep['phase_b']['seconds'],
                      'status': rep['status']}), flush=True)
    return rep


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--tiles', type=int, default=32)
    ap.add_argument('--size', type=int, default=3660)
    ap.add_argument('--kill-after-done', type=int, default=6)
    ap.add_argument('--root', default='/tmp/proteus_soak_b2b')
    ap.add_argument('--abba', action='store_true',
                    help='also re-run the integer soak AFTER the scaled '
                         'one (A/B/A: separates mode effects from '
                         'monotonic box drift)')
    ap.add_argument('--keep-data', action='store_true',
                    help='keep the synthetic datasets + outputs')
    args = ap.parse_args()

    summary = {'generated': time.strftime('%Y-%m-%dT%H:%M:%SZ',
                                          time.gmtime()),
               'tiles': args.tiles, 'size': args.size, 'runs': []}

    order = ['int', 'scaled'] + (['int_again'] if args.abba else [])
    reports = {}
    for mode in order:
        real_mode = 'scaled' if mode == 'scaled' else 'int'
        rep = run_one(real_mode, args)
        reports[mode] = rep
        entry = {'mode': mode,
                 'phase_a_s': rep['phase_a']['seconds'],
                 'phase_b_s': rep['phase_b']['seconds'],
                 'status': rep['status']}
        stats = rep['phase_b'].get('campaign_stats', {})
        if stats.get('stage_seconds'):
            entry['stage_seconds'] = stats['stage_seconds']
        summary['runs'].append(entry)
        if mode == 'int_again':
            # this second integer run overwrote SOAK_CAMPAIGN.json;
            # keep the first run's artifact as the canonical one
            with open(os.path.join(REPO, 'SOAK_CAMPAIGN.json'),
                      'w') as fh:
                json.dump(reports['int'], fh, indent=1)

    b_int = reports['int']['phase_b']['seconds']
    b_sc = reports['scaled']['phase_b']['seconds']
    summary['phase_b_scaled_over_int'] = round(b_sc / b_int, 2)
    if args.abba:
        summary['phase_b_int_again_s'] = \
            reports['int_again']['phase_b']['seconds']
    with open(os.path.join(REPO, 'SOAK_BACK_TO_BACK.json'), 'w') as fh:
        json.dump(summary, fh, indent=1)
    print(json.dumps({'artifact': 'SOAK_BACK_TO_BACK.json',
                      'phase_b_scaled_over_int':
                          summary['phase_b_scaled_over_int']}))
    if not args.keep_data:
        shutil.rmtree(args.root, ignore_errors=True)


if __name__ == '__main__':
    main()
