// Golden RRTC fixture generator: runs the reference RRT-Connect planner
// (planning/rrtc.hh, with a linear-scan exact NN standing in for the
// CPM-fetched nigh kd-tree — see stub/nigh/) on the Panda sphere-cage demo
// and dumps solved/iterations/path/cost for parity tests. Build & run:
//
//   g++ -O0 -march=native -std=c++17 \
//       -I /root/reference/src/impl -I tools/golden/stub \
//       tools/golden/golden_rrtc.cc -o /tmp/golden_rrtc
//   /tmp/golden_rrtc > tests/golden/reference_rrtc.json

#include <array>
#include <cstdio>
#include <memory>
#include <vector>

#include <vamp/vector.hh>
#include <vamp/collision/environment.hh>
#include <vamp/collision/validity.hh>
#include <vamp/planning/validate.hh>
#include <vamp/planning/rrtc.hh>
#include <vamp/planning/simplify.hh>
#include <vamp/random/halton.hh>
#include <vamp/robots/panda_base.hh>

using namespace vamp;

static constexpr std::size_t rake = 8;
using Robot = robots::PandaBase<0, 0, 0>;
using EnvF = collision::Environment<float>;
using EnvV = collision::Environment<FloatVector<rake>>;

static void print_floats(const float *v, std::size_t n)
{
    std::printf("[");
    for (std::size_t i = 0; i < n; ++i)
        std::printf("%s%.9g", i ? "," : "", static_cast<double>(v[i]));
    std::printf("]");
}

int main()
{
    EnvF env_f;
    const float centers[14][3] = {
        {0.55, 0, 0.25},    {0.35, 0.35, 0.25}, {0, 0.55, 0.25},   {-0.55, 0, 0.25},
        {-0.35, -0.35, 0.25}, {0, -0.55, 0.25}, {0.35, -0.35, 0.25}, {0.35, 0.35, 0.8},
        {0, 0.55, 0.8},     {-0.35, 0.35, 0.8}, {-0.55, 0, 0.8},   {-0.35, -0.35, 0.8},
        {0, -0.55, 0.8},    {0.35, -0.35, 0.8}};
    for (auto &c : centers)
        env_f.spheres.emplace_back(collision::Sphere<float>(c[0], c[1], c[2], 0.2F));
    env_f.sort();
    EnvV env(env_f);

    alignas(32) std::array<float, 8> a_arr{0.F, -0.785F, 0.F, -2.356F, 0.F, 1.571F, 0.785F, 0.F};
    alignas(32) std::array<float, 8> b_arr{2.35F, 1.F, 0.F, -0.8F, 0.F, 2.5F, 0.785F, 0.F};
    Robot::Configuration start(a_arr.data());
    Robot::Configuration goal(b_arr.data());

    planning::RRTCSettings settings;
    settings.range = 1.0;  // vamp python layer default for panda
                           // (src/vamp/constants.py ROBOT_RRT_RANGES)

    std::printf("{\n\"runs\": [");
    const int skips[] = {0, 1000, 5000};
    bool first = true;
    for (int skip : skips)
    {
        auto rng = std::make_shared<rng::Halton<7>>();
        for (int i = 0; i < skip; ++i)
            rng->next();

        auto result =
            planning::RRTC<Robot, rake, Robot::resolution>::solve(start, goal, env, settings, rng);

        std::printf("%s\n  {\"skip\": %d, \"solved\": %s, \"iterations\": %zu, \"cost\": %.9g,\n",
                    first ? "" : ",", skip, result.path.size() >= 2 ? "true" : "false",
                    result.iterations, static_cast<double>(result.cost));
        std::printf("   \"sizes\": [%zu, %zu],\n", result.size[0], result.size[1]);
        std::printf("   \"path\": [");
        for (std::size_t i = 0; i < result.path.size(); ++i)
        {
            alignas(32) std::array<float, 8> buf{};
            result.path[i].to_array(buf.data());
            std::printf(i ? ",\n      " : "\n      ");
            print_floats(buf.data(), 7);
        }
        std::printf("],\n");

        // default-settings simplification on the solved path (deterministic:
        // SHORTCUT + BSPLINE only; the rng is unused by those routines)
        planning::SimplifySettings simp;
        auto simple =
            planning::simplify<Robot, rake, Robot::resolution>(result.path, env, simp, rng);
        std::printf("   \"simplified_cost\": %.9g, \"simplify_iters\": %zu,\n",
                    static_cast<double>(simple.path.cost()), simple.iterations);
        std::printf("   \"simplified_path\": [");
        for (std::size_t i = 0; i < simple.path.size(); ++i)
        {
            alignas(32) std::array<float, 8> buf{};
            simple.path[i].to_array(buf.data());
            std::printf(i ? ",\n      " : "\n      ");
            print_floats(buf.data(), 7);
        }
        std::printf("]}");
        first = false;
    }
    std::printf("\n],");

    // per-op simplification trace for the skip=1000 path (debug parity aid):
    // replays the simplify driver loop calling shortcut/bspline directly and
    // dumps the path after each op.
    {
        auto rng = std::make_shared<rng::Halton<7>>();
        for (int i = 0; i < 1000; ++i)
            rng->next();
        auto result =
            planning::RRTC<Robot, rake, Robot::resolution>::solve(start, goal, env, settings, rng);
        planning::SimplifySettings simp;
        auto path = result.path;
        std::printf("\n\"simplify_trace\": [");
        bool first_op = true;
        for (int iter = 0; iter < 5; ++iter)
        {
            bool any = false;
            const char *names[2] = {"shortcut", "bspline"};
            for (int op = 0; op < 2; ++op)
            {
                bool changed = (op == 0) ? planning::shortcut_path<Robot, rake, Robot::resolution>(
                                               path, env, simp.shortcut) :
                                           planning::smooth_bspline<Robot, rake, Robot::resolution>(
                                               path, env, simp.bspline);
                any |= changed;
                std::printf("%s\n  {\"iter\": %d, \"op\": \"%s\", \"changed\": %s, \"len\": %zu, \"cost\": %.9g, \"path\": [",
                            first_op ? "" : ",", iter, names[op], changed ? "true" : "false",
                            path.size(), static_cast<double>(path.cost()));
                for (std::size_t i = 0; i < path.size(); ++i)
                {
                    alignas(32) std::array<float, 8> buf{};
                    path[i].to_array(buf.data());
                    std::printf("%s", i ? "," : "");
                    print_floats(buf.data(), 7);
                }
                std::printf("]}");
                first_op = false;
            }
            if (!any)
                break;
        }
        std::printf("\n]");
    }

    // -- single-core timing baseline on this machine ------------------------
    // (mirrors sphere_cage_example.py's benchmark loop; used by bench.py as
    // the vs_baseline denominator on identical hardware)
    {
        auto rng = std::make_shared<rng::Halton<7>>();
        const int n_trials = 200;
        double total_ns = 0.0;
        std::size_t solved = 0;
        for (int t = 0; t < n_trials; ++t)
        {
            auto result = planning::RRTC<Robot, rake, Robot::resolution>::solve(
                start, goal, env, settings, rng);
            total_ns += static_cast<double>(result.nanoseconds);
            solved += result.path.size() >= 2;
        }
        std::printf(
            ",\n\"bench\": {\"trials\": %d, \"solved\": %zu, \"mean_us\": %.3f, \"solves_per_s\": %.1f}\n",
            n_trials, solved, total_ns / n_trials / 1e3, 1e9 * n_trials / total_ns);
    }
    std::printf("}\n");
    return 0;
}
