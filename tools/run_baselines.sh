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
        $COMMON mountain-car
        ;;
    procgen)
        for env in bigfish bossfight caveflyer chaser climber coinrun \
            dodgeball fruitbot heist jumper leaper maze miner ninja \
            plunder starpilot; do
            $COMMON $env
        done
        ;;
    atari)
        $COMMON pong --vec multiprocessing
        $COMMON breakout --vec multiprocessing
        $COMMON beam-rider --vec multiprocessing
        ;;
    *)
        echo "Unknown group: $GROUP"
        exit 1
        ;;
esac
