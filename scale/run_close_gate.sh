#!/bin/bash
set -x
cd /root/repo
sbt -batch test > /tmp/r15c_test.log 2>&1; echo "TEST_RC=$?" >> /tmp/r15c_status.log
sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/r15c_v001" > /tmp/r15c_v001.log 2>&1; echo "V001_RC=$?" >> /tmp/r15c_status.log
python3 tools/oracle_check.py /root/testdata/sf0.01 /tmp/r15c_v001 > /tmp/r15c_o001.log 2>&1; echo "O001_RC=$? $(tail -1 /tmp/r15c_o001.log)" >> /tmp/r15c_status.log
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 /tmp/r15c_v01" > /tmp/r15c_v01.log 2>&1; echo "V01_RC=$?" >> /tmp/r15c_status.log
python3 tools/oracle_check.py /root/testdata/sf0.1 /tmp/r15c_v01 > /tmp/r15c_o01.log 2>&1; echo "O01_RC=$? $(tail -1 /tmp/r15c_o01.log)" >> /tmp/r15c_status.log
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" > /tmp/r15c_bench.log 2>&1; echo "BENCH_RC=$?" >> /tmp/r15c_status.log
grep '"metric":"total"' /tmp/r15c_bench.log | tail -1 > scale/bench_sf0.1_r15_close.json
cp scale/bench_detail_sf0.1.json scale/bench_detail_sf0.1_r15_close.json 2>/dev/null
sbt -batch "runMain graft.ScaleGen" > /tmp/r15c_scalegen.log 2>&1; echo "SCALEGEN_RC=$?" >> /tmp/r15c_status.log
SPARK_GRAFT_SF_DIR=/root/repo/scale10x SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.Bench" > /tmp/r15c_bench10x.log 2>&1; echo "BENCH10X_RC=$?" >> /tmp/r15c_status.log
grep '"metric":"total"' /tmp/r15c_bench10x.log | tail -1 > scale/bench_10x_r15_close.json
cp scale/bench_detail_scale10x.json scale/bench_detail_10x_r15_close.json 2>/dev/null
sbt -batch "runMain graft.Verify /root/repo/scale10x /tmp/r15c_v10x" > /tmp/r15c_v10x.log 2>&1; echo "V10X_RC=$?" >> /tmp/r15c_status.log
python3 tools/oracle_check.py /root/repo/scale10x /tmp/r15c_v10x > /tmp/r15c_o10x.log 2>&1; echo "O10X_RC=$? $(tail -1 /tmp/r15c_o10x.log)" >> /tmp/r15c_status.log
echo DONE >> /tmp/r15c_status.log
