#!/bin/bash
# Baseline runner (reference run_baselines.sh): train + upload baselines
# for an env group. Usage: tools/run_baselines.sh <group>

if [ "$#" -ne 1 ]; then
    echo "Usage: $0 <group>   (ocean | classic | procgen | atari)"
    exit 1
fi

GROUP=$1
COMMON="python demo.py --mode train --track --env"

case $GROUP in
    ocean)
        $COMMON squared
        $COMMON password
        $COMMON stochastic
        $COMMON memory
        $COMMON multiagent
        $COMMON spaces
        $COMMON bandit
        ;;
    classic)
        $COMMON cartpole
        $COMMON mountaincar
        ;;
    procgen)
        # named config.yaml sections; other procgen games use
        # --env <name> with the procgen package defaults
        for env in bigfish coinrun maze miner starpilot; do
            $COMMON $env
        done
        ;;
    atari)
        $COMMON pong --vec multiprocessing
        $COMMON breakout --vec multiprocessing
        $COMMON beamrider --vec multiprocessing
        ;;
    *)
        echo "Unknown group: $GROUP"
        exit 1
        ;;
esac
